"""Persistent XLA compilation cache for all entry points.

The flagship T=1000 reverse-diffusion scan costs minutes of XLA compile
cold; the persistent cache makes every later launch of the same shapes
near-instant. bench.py and benchmarks/ already opt in — this helper
gives the CLIs (train/sample/byop/serve) the same treatment. Must be
called before the first compilation; safe to call more than once.
"""
from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None):
    import jax

    # Platform override for every CLI: KPDIFF_PLATFORM=cpu (+ optional
    # KPDIFF_CPU_DEVICES=N virtual devices) runs train/sample/byop/serve
    # without an accelerator — e.g. CPU smoke runs or mesh experiments.
    # Must win over the container's sitecustomize, which force-registers
    # a TPU backend and eats JAX_PLATFORMS; jax.config.update does, as
    # long as it lands before the first device query (we are called at
    # the top of every CLI main).
    platform = os.environ.get("KPDIFF_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
        n_dev = os.environ.get("KPDIFF_CPU_DEVICES")
        if n_dev and platform == "cpu":
            jax.config.update("jax_num_cpu_devices", int(n_dev))

    cache_dir = cache_dir or os.environ.get("KPDIFF_JAX_CACHE", "/tmp/kpdiff_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass  # older jax without the knob; compilation still works, just cold

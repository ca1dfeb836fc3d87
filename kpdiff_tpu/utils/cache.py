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

    cache_dir = cache_dir or os.environ.get("KPDIFF_JAX_CACHE", "/tmp/kpdiff_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass  # older jax without the knob; compilation still works, just cold

"""VPU elementwise/transcendental throughput microbenchmark.

Why: the EGNN/GVP pair MLPs apply SiLU (x*sigmoid(x), lowered to tanh on
TPU) to every pair element 4x per edge type per layer. Whether the sampler
step is HBM-bytes-bound or VPU-transcendental-bound decides where the
remaining headroom is (BENCH_VARIANTS.json pct_of_floor) — the bytes-only
roofline floor is a LOWER bound that ignores VPU serial time entirely.

Method: each op runs as a lax.fori_loop chain of `iters` applications over
one resident (n, n) array, so per-iteration HBM traffic is the same
2 passes (read + write) for every op and dispatch overhead is amortized.
The `copy` row (x * 1.0001) measures the pure 2-pass bandwidth cost; any
excess per-element time of tanh/sigmoid/silu/exp over `copy` is VPU
compute. elems/s for the excess is the calibrated transcendental rate
consumed by benchmarks/roofline.py's vpu_floor_ms.

Usage: python benchmarks/micro_vpu.py [--n 4096] [--iters 64] [--dtype f32]
Prints one JSON line.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/kpdiff_jax_cache")

OPS = {
    "copy": lambda x: x * 1.0001,
    "add": lambda x: x + 0.0001,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "silu": jax.nn.silu,
    "exp": lambda x: jnp.exp(jnp.minimum(x, 1.0)),
}


def time_op(fn, x, iters, reps=5):
    import numpy as np

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, iters, lambda i, a: fn(a), x)

    out = run(x)
    np.asarray(out[:1, :1])  # compile + force (axon block_until_ready no-op)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = run(x)
        np.asarray(out[:1, :1])
        ts.append(time.time() - t0)
    return min(ts) / iters


def measure(n=4096, iters=64, dtype="float32"):
    x = jnp.linspace(-2.0, 2.0, n * n, dtype=jnp.dtype(dtype)).reshape(n, n)
    elems = n * n
    per_op = {}
    for name, fn in OPS.items():
        per_op[name] = time_op(fn, x, iters)
    base = per_op["copy"]
    rows = {}
    for name, t in per_op.items():
        excess = t - base
        rows[name] = {
            "s_per_iter": round(t * 1e6, 2),  # us
            "elems_per_s": round(elems / t / 1e9, 2),  # G
            "excess_elems_per_s": (round(elems / excess / 1e9, 2)
                                   if excess > base * 0.05 else None),  # G; None => bandwidth-bound
        }
    return {"n": n, "iters": iters, "dtype": dtype, "elems": elems,
            "device": jax.devices()[0].device_kind, "ops_us": rows}


def transcendental_rate(n=4096, iters=64, dtype="float32"):
    """Calibrated tanh elems/s EXCESS over the bandwidth cost (inf when
    tanh is bandwidth-bound, i.e. transcendentals are free at this size)."""
    x = jnp.linspace(-2.0, 2.0, n * n, dtype=jnp.dtype(dtype)).reshape(n, n)
    base = time_op(OPS["copy"], x, iters)
    t = time_op(OPS["tanh"], x, iters)
    excess = t - base
    if excess <= base * 0.05:
        return float("inf")
    return (n * n) / excess


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()
    dt = {"f32": "float32", "bf16": "bfloat16"}.get(args.dtype, args.dtype)
    print(json.dumps(measure(args.n, args.iters, dt)))


if __name__ == "__main__":
    main()

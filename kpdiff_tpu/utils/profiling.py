"""Tracing / profiling helpers — a first-class subsystem the reference
lacks (SURVEY.md §5.1: only ad-hoc time.time() spans).

  * `phase_timer`: named wall-clock spans, accumulated + queryable;
    drop-in for the reference's sample_time bookkeeping (test.py:149,215).
  * `device_trace`: context manager around jax.profiler.trace — produces
    a TensorBoard-loadable trace directory of the XLA execution.
  * `block(x)`: robust completion barrier. On remote-relay TPU backends
    jax.block_until_ready returns immediately; fetching one scalar to host
    is the reliable way to wait (used by bench.py and the timers).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import numpy as np


def block(x):
    """Force completion of a pytree of jax arrays (remote-backend safe)."""
    import jax

    leaves = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, "dtype")]
    if leaves:
        np.asarray(jax.device_get(leaves[0]))
    return x


class PhaseTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.time()
        try:
            yield
        finally:
            if sync is not None:
                block(sync)
            dt = time.time() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": self.totals[k], "count": self.counts[k], "mean_s": self.totals[k] / self.counts[k]}
            for k in self.totals
        }

    def __str__(self):
        return " | ".join(f"{k}: {v['total_s']:.2f}s/{v['count']}" for k, v in self.report().items())


@contextlib.contextmanager
def device_trace(log_dir: str):
    """XLA device trace (view with TensorBoard's profile plugin)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

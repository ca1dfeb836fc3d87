"""Multi-host initialization + mesh helpers.

The reference has no distributed runtime at all (SURVEY §5.8: scale-out
via SLURM command files). Here multi-host data parallelism is the standard
JAX recipe: `jax.distributed.initialize` on every process, one global
'data' mesh over all devices; gradient psums ride ICI within a slice and
DCN across slices automatically. Single-host callers can skip initialize()
entirely — `make_mesh` already covers that path.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize the JAX distributed runtime. On TPU pods all arguments are
    discovered from the environment; on CPU/GPU clusters pass them (or set
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID)."""
    kwargs = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = coordinator_address or os.environ["JAX_COORDINATOR_ADDRESS"]
    if num_processes or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = num_processes or int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = process_id if process_id is not None else int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)


def global_data_mesh(axis_names: Sequence[str] = ("data",)):
    """Mesh over ALL global devices (multi-host aware)."""
    import numpy as np
    from jax.sharding import Mesh

    devices = jax.devices()
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.array(devices).reshape(shape), axis_names)


def process_local_batch_slice(global_batch: int) -> slice:
    """Which rows of the global batch this process should load (per-host
    data loading for multi-host training)."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    return slice(i * per, (i + 1) * per)

"""Device mesh + sharding helpers.

The reference has NO distributed story (single GPU, train.py:398-399;
scale-out is SLURM array jobs, SURVEY.md §2.4). Here, scaling is
first-class: a 1-D 'data' mesh shards the batch dimension of every
PaddedComplex leaf; gradients are combined by XLA's SPMD partitioner
(psum over ICI) inside the jitted train step. The mesh is built with a
'data' axis by default but helpers accept any axis layout so tensor
axes can be added later without touching call sites.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_names: Sequence[str] = ("data",),
              axis_sizes: Optional[Sequence[int]] = None) -> Mesh:
    """axis_sizes: explicit per-axis device counts (e.g. (2, 4) for a
    dp x mp mesh); default puts every device on the first axis."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} device(s) are visible — a silently "
                "truncated mesh would no-op the requested sharding")
        devices = devices[:n_devices]
    if axis_sizes is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    else:
        shape = tuple(axis_sizes)
        devices = devices[: int(np.prod(shape))]
    return Mesh(np.array(devices).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (batch) across 'data', replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(tree, mesh: Mesh):
    """Device-put every array leaf with its batch dim sharded over 'data'."""
    sh = batch_sharding(mesh)

    def put(x):
        if x is None:
            return None
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, tree)

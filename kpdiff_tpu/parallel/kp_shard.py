"""Keypoint-axis model parallelism for sampling (sequence-parallel analog).

Data parallelism (mesh.py) shards the BATCH; at batch 1 — interactive
serving, serve.py — it does nothing. The heavy variants' per-step cost
is HBM traffic over pair tensors whose leading graph axis is the
keypoint set: the kk pair grids are (B, K, K, H) with K = 384 pocket
atoms for the all_atom configs (the reference builds the same kk
messages sparsely per step, models/dynamics.py:124-208). Sharding the
KEYPOINT axis instead row-shards every kk pair tensor — (B, K/n, K, H)
per device, verified from compiled HLO in tests/test_kp_sharding.py —
dividing per-chip pair traffic by the mesh size, so SINGLE-POCKET
latency scales with chips.

This is sharding annotations ONLY: no model code changes. XLA's SPMD
partitioner propagates the input shardings and inserts the collectives
(psum for kp-axis reductions and for onehot-matmul gathers whose
contracting dim is sharded; all-gathers for the per-step kl/lk kNN over
the sharded candidate set). The collectives ride ICI and touch
(B, K, H)-sized node tensors, never the (B, K, K, H) pair grids. It
therefore composes with every kk layout (dense / capped neighbor list
from compact_kk) and with a 'data' batch axis for dp x mp meshes.

If K does not divide the axis size, the keypoint set is first padded
with masked rows — masking IS the padding contract everywhere in this
codebase (models/complex.py), so this is exact.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _pad_axis(x: jnp.ndarray, dim: int, new: int, fill=0):
    pad = [(0, 0)] * x.ndim
    pad[dim] = (0, new - x.shape[dim])
    if x.dtype == bool:
        return jnp.pad(x, pad, constant_values=False)
    return jnp.pad(x, pad, constant_values=fill)


def pad_kp(enc, kk, multiple: int) -> Tuple[Any, Any]:
    """Pad the keypoint axis of an encoded complex (and its kk edges) with
    masked rows up to the next multiple of `multiple`. Exact: every kp
    consumer reduces under kp_mask, and neighbor-list indices keep
    referring to the original (unmoved) rows."""
    K = enc.kp_x.shape[1]
    Kp = ((K + multiple - 1) // multiple) * multiple
    if Kp == K:
        return enc, kk
    enc = enc.replace(
        kp_x=_pad_axis(enc.kp_x, 1, Kp),
        kp_h=_pad_axis(enc.kp_h, 1, Kp),
        kp_mask=_pad_axis(enc.kp_mask, 1, Kp),
        kp_v=None if enc.kp_v is None else _pad_axis(enc.kp_v, 1, Kp),
    )
    if isinstance(kk, tuple):  # capped neighbor list (idx, mask)
        kk = tuple(_pad_axis(a, 1, Kp) for a in kk)
    elif isinstance(kk, jnp.ndarray) and kk.ndim == 3:  # dense (B, K, K)
        kk = _pad_axis(_pad_axis(kk, 1, Kp), 2, Kp)
    elif isinstance(kk, dict):
        raise ValueError(
            "block kk layout tiles the kp axis and cannot be row-padded; "
            "use compact_kk (exact) before kp-sharding")
    return enc, kk


def shard_encoded(enc, kk, mesh: Mesh, axis: str = "model",
                  batch_axis: Optional[str] = None, params: Any = None):
    """device_put an encoded complex with its keypoint axis sharded over
    `axis` (padding K to a multiple of the axis size first) and everything
    else replicated — optionally batch-sharded over `batch_axis` for
    dp x mp meshes. Returns (enc, kk) or (enc, kk, params) when params
    are given (params are always replicated)."""
    n = mesh.shape[axis]
    if isinstance(kk, dict) and n > 1:
        raise ValueError("kp-sharding the block kk layout is unsupported; "
                         "run model.compact_kk first (exact rebuild)")
    enc, kk = pad_kp(enc, kk, n)

    def put(x, kp_dim=None):
        if x is None:
            return None
        spec = [None] * x.ndim
        if batch_axis is not None:
            spec[0] = batch_axis
        if kp_dim is not None:
            spec[kp_dim] = axis
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    enc = enc.replace(
        kp_x=put(enc.kp_x, 1), kp_h=put(enc.kp_h, 1), kp_mask=put(enc.kp_mask, 1),
        kp_v=put(enc.kp_v, 1),
        lig_x=put(enc.lig_x), lig_h=put(enc.lig_h), lig_mask=put(enc.lig_mask),
        rec_x=put(enc.rec_x), rec_h=put(enc.rec_h), rec_mask=put(enc.rec_mask),
        rec_res_idx=put(enc.rec_res_idx), ip_x=put(enc.ip_x), ip_mask=put(enc.ip_mask),
    )
    if isinstance(kk, tuple):
        kk = tuple(put(a, 1) for a in kk)
    else:
        kk = put(kk, 1)
    if params is not None:
        repl = NamedSharding(mesh, P())
        params = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), params)
        return enc, kk, params
    return enc, kk


def kp_constraint_fn(mesh: Mesh, axis: str = "model", batch_axis: str = "data"):
    """Returns a (cpx, kk) -> (cpx, kk) callable applying
    `with_sharding_constraint` to the keypoint axis — the in-jit analog of
    shard_encoded for the TRAINING loss, where the encoder runs inside the
    differentiated step (model.loss(kp_constraint=...) seam). The encoder
    itself stays batch-parallel; its (B, K, H)-sized outputs reshard once,
    and the dynamics' (B, K, K, H) pair grids (and their gradients — the
    constraint transposes to itself) row-shard over `axis`.

    K must divide the axis size here: in-jit padding would change every
    downstream shape. The block kk layout is left unconstrained (its tile
    axis is not row-divisible); GSPMD still chooses a layout, correctness
    is unaffected."""
    from jax.lax import with_sharding_constraint as wsc

    def c(x, kp_dim=None):
        if x is None:
            return None
        spec = [None] * x.ndim
        if batch_axis in mesh.axis_names:
            spec[0] = batch_axis
        if kp_dim is not None:
            spec[kp_dim] = axis
        return wsc(x, NamedSharding(mesh, P(*spec)))

    n = mesh.shape[axis]

    def apply(cpx, kk):
        K = cpx.kp_x.shape[1]
        if K % n:
            raise ValueError(
                f"n_keypoints {K} must be divisible by the '{axis}' mesh axis "
                f"size {n} for kp-sharded training (sampling pads instead — "
                "shard_encoded)")
        cpx = cpx.replace(
            kp_x=c(cpx.kp_x, 1), kp_h=c(cpx.kp_h, 1), kp_mask=c(cpx.kp_mask, 1),
            kp_v=c(cpx.kp_v, 1),
        )
        if isinstance(kk, tuple):
            kk = tuple(c(a, 1) for a in kk)
        elif isinstance(kk, jnp.ndarray) and kk.ndim == 3:
            kk = c(kk, 1)
        return cpx, kk

    return apply

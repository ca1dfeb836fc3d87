"""Masked geometry primitives over padded (B, N, ...) arrays.

These replace the reference's DGL readouts / apply_edges geometry
(e.g. dgl.readout_nodes COM at ligand_diffuser.py:199, u_sub_v +
norm at dynamics.py:159-170) with dense masked tensor ops that XLA
fuses onto the VPU/MXU.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "masked_mean",
    "masked_com",
    "pairwise_diff",
    "pairwise_dist",
    "norm_no_nan",
    "rbf_embed",
]


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis: int, keepdims: bool = False, eps: float = 0.0) -> jnp.ndarray:
    """Mean of `x` over `axis` counting only entries where `mask` is true.

    `mask` broadcasts against x with trailing feature dims allowed on x.
    Entirely-masked rows return 0 (denominator clamped to >= 1).
    """
    mask = mask.astype(x.dtype)
    while mask.ndim < x.ndim:
        mask = mask[..., None]
    total = jnp.sum(x * mask, axis=axis, keepdims=keepdims)
    count = jnp.sum(mask, axis=axis, keepdims=keepdims)
    return total / jnp.maximum(count, 1.0 + eps)


def masked_com(pos: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Center of mass of (B, N, 3) positions under (B, N) mask -> (B, 3).

    Equivalent of dgl.readout_nodes(op='mean') on positions
    (reference ligand_diffuser.py:199).
    """
    return masked_mean(pos, mask, axis=1)


def pairwise_diff(x_dst: jnp.ndarray, x_src: jnp.ndarray) -> jnp.ndarray:
    """x_src[j] - x_dst[i] ->  (B, Nd, Ns, 3)? No: src-minus-dst per DGL u_sub_v.

    DGL's fn.u_sub_v("x","x","x_diff") computes src_x - dst_x per edge
    (dynamics.py:160). We return diff[b, s, d, :] = x_src[b,s] - x_dst[b,d]
    with SOURCE as the second axis, matching our (B, Ns, Nd) edge layout.
    """
    return x_src[:, :, None, :] - x_dst[:, None, :, :]


def norm_no_nan(x: jnp.ndarray, axis: int = -1, keepdims: bool = False, eps: float = 1e-8, sqrt: bool = True) -> jnp.ndarray:
    """L2 norm clamped above eps before the sqrt (safe gradients at 0).

    Matches the reference GVP helper models/gvp.py:12-19.
    """
    out = jnp.clip(jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims), min=eps)
    return jnp.sqrt(out) if sqrt else out


def pairwise_dist(x_dst: jnp.ndarray, x_src: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Euclidean distance matrix (B, Ns, Nd) between padded point sets."""
    diff = pairwise_diff(x_dst, x_src)
    d2 = jnp.sum(jnp.square(diff), axis=-1)
    if eps > 0:
        d2 = jnp.maximum(d2, eps)
    return jnp.sqrt(d2)


def rbf_embed(d: jnp.ndarray, d_min: float = 0.0, d_max: float = 20.0, d_count: int = 16) -> jnp.ndarray:
    """Gaussian radial-basis embedding of distances along a new last axis.

    Matches reference models/gvp.py:26-41 (_rbf): centers linspace(d_min,
    d_max, d_count), sigma = (d_max - d_min)/d_count.
    """
    mu = jnp.linspace(d_min, d_max, d_count, dtype=d.dtype)
    sigma = (d_max - d_min) / d_count
    return jnp.exp(-(((d[..., None] - mu) / sigma) ** 2))

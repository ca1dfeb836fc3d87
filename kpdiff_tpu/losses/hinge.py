"""Distance hinge losses (reference losses/dist_hinge_loss.py)."""
from __future__ import annotations

import jax.numpy as jnp

from kpdiff_tpu.ops.geometry import pairwise_dist


def masked_hinge_loss(
    pos_a: jnp.ndarray,  # (B, Na, 3)
    mask_a: jnp.ndarray,
    pos_b: jnp.ndarray,  # (B, Nb, 3)
    mask_b: jnp.ndarray,
    threshold: float,
) -> jnp.ndarray:
    """sum over valid pairs of max(threshold - d, 0), summed over the batch.

    Matches DistanceHingeLoss with pos_b given (two point sets, full matrix;
    reference dist_hinge_loss.py:10-25). The reference sums per graph in a
    python loop (ligand_diffuser.py:150-155); here one masked reduction.
    """
    d = pairwise_dist(pos_b, pos_a)  # (B, Na, Nb) with src=pos_a rows
    valid = mask_a[:, :, None] & mask_b[:, None, :]
    loss = jnp.maximum(threshold - d, 0.0) * valid
    return jnp.sum(loss)


def masked_self_hinge_loss(pos: jnp.ndarray, mask: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Upper-triangle variant for a single point set (dist_hinge_loss.py:12-13,21-22)."""
    d = pairwise_dist(pos, pos)
    n = pos.shape[1]
    triu = jnp.triu(jnp.ones((n, n), bool), k=1)
    valid = mask[:, :, None] & mask[:, None, :] & triu[None]
    loss = jnp.maximum(threshold - d, 0.0) * valid
    return jnp.sum(loss)

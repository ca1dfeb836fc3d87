"""Fixed (non-learned) receptor encoder.

The reference deletes the kp nodes and re-adds one keypoint per pocket
atom, copying positions/features, then copies the rr radius edges to kk
(models/receptor_encoder_fixed.py:9-66). In the padded world this is a
pure relabeling: kp_* arrays become views of rec_* arrays, and the kk
edge set is the rr radius graph (cutoff graph_cutoffs['rr'], NOT
graph_cutoffs['kk'] — it inherits the rr construction).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from kpdiff_tpu.models.complex import PaddedComplex
from kpdiff_tpu.ops.neighbors import dense_radius_adjacency, radius_neighbor_list


def fixed_encode(
    cpx: PaddedComplex,
    n_vec_feats: Optional[int] = None,
    sort_spatial: bool = False,
) -> PaddedComplex:
    """Copy pocket atoms into the keypoint slots.

    sort_spatial: order the keypoints along a Morton curve so the
    block-dense kk layout (`kk_layout: block`) covers most radius edges
    with banded tiles. Keypoints are a set — the permutation changes no
    semantics elsewhere."""
    kp_x, kp_h, kp_mask = cpx.rec_x, cpx.rec_h, cpx.rec_mask
    if sort_spatial:
        from kpdiff_tpu.ops.spatial import spatial_sort_permutation

        perm = spatial_sort_permutation(kp_x, kp_mask)
        kp_x = jnp.take_along_axis(kp_x, perm[..., None], axis=1)
        kp_h = jnp.take_along_axis(kp_h, perm[..., None], axis=1)
        kp_mask = jnp.take_along_axis(kp_mask, perm, axis=1)
    kp_v = None
    if n_vec_feats is not None:
        kp_v = jnp.zeros((*kp_x.shape[:2], n_vec_feats, 3), kp_x.dtype)
    return cpx.replace(kp_x=kp_x, kp_h=kp_h, kp_mask=kp_mask, kp_v=kp_v)


def fixed_kk_edges(cpx: PaddedComplex, rr_cutoff: float, layout: str = "dense", max_neighbors: int = 100):
    """kk edges for the fixed encoder = rr radius graph over pocket atoms
    (receptor_encoder_fixed.py:41-45 copies rr edges; data prep built rr with
    radius_graph(r=cutoffs['rr'], max 100), pdbbind_processing.py:246)."""
    if layout == "dense":
        return dense_radius_adjacency(cpx.kp_x, cpx.kp_mask, cpx.kp_x, cpx.kp_mask, rr_cutoff, exclude_self=True)
    return radius_neighbor_list(
        cpx.kp_x, cpx.kp_mask, cpx.kp_x, cpx.kp_mask, rr_cutoff, max_neighbors, exclude_self=True
    )

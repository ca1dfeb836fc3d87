"""Static-shape neighbor structures replacing torch_cluster radius/knn.

The reference rebuilds DGL edge lists with torch_cluster every dynamics
call (dynamics.py:387-420) and in the encoders
(receptor_encoder.py:247,273,540; receptor_encoder_gvp.py:285,304-306).
On TPU, edges must have static shapes, so we provide two layouts:

  * dense masked adjacency (B, Ns, Nd) — for small node sets
    (ligand<=~64, keypoints<=~40). Exact, no caps, fully vectorized.
  * destination-major neighbor lists (B, N, K) of source indices —
    for large sets (pocket atoms / all-atom keypoints). Aggregation
    becomes a sum over the K axis: no scatter anywhere.

Edge-direction conventions follow the reference exactly:
  ll  — each ligand atom receives from neighbors (knn_graph / radius_graph,
        dynamics.py:393-397): per-DST selection.
  kl  — each keypoint sends to its k nearest ligand atoms (torch_cluster
        knn(x=lig, y=kp), dynamics.py:400-404): per-SRC selection.
  rk  — each keypoint receives from its k_closest rec atoms
        (receptor_encoder.py:273): per-DST selection.

Semantic note: torch_cluster `radius` keeps an arbitrary first
max_num_neighbors within the radius; our neighbor lists keep the
NEAREST ones, which is deterministic and at least as informative.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "masked_pair_dist2",
    "dense_radius_adjacency",
    "dense_knn_adjacency",
    "knn_indices",
    "radius_neighbor_list",
]

_INF = 1e30


def masked_pair_dist2(
    x_src: jnp.ndarray,
    mask_src: jnp.ndarray,
    x_dst: jnp.ndarray,
    mask_dst: jnp.ndarray,
    exclude_self: bool = False,
) -> jnp.ndarray:
    """Squared distances (B, Ns, Nd) with invalid pairs set to +inf."""
    diff = x_src[:, :, None, :] - x_dst[:, None, :, :]
    d2 = jnp.sum(jnp.square(diff), axis=-1)
    valid = mask_src[:, :, None] & mask_dst[:, None, :]
    if exclude_self:
        ns, nd = d2.shape[1], d2.shape[2]
        eye = jnp.eye(ns, nd, dtype=bool)
        valid = valid & ~eye[None]
    return jnp.where(valid, d2, _INF)


def dense_radius_adjacency(
    x_src: jnp.ndarray,
    mask_src: jnp.ndarray,
    x_dst: jnp.ndarray,
    mask_dst: jnp.ndarray,
    radius: float,
    exclude_self: bool = False,
) -> jnp.ndarray:
    """Boolean (B, Ns, Nd): src within `radius` of dst (strict <, as in torch_cluster)."""
    d2 = masked_pair_dist2(x_src, mask_src, x_dst, mask_dst, exclude_self=exclude_self)
    return d2 < float(radius) ** 2


def dense_knn_adjacency(
    x_src: jnp.ndarray,
    mask_src: jnp.ndarray,
    x_dst: jnp.ndarray,
    mask_dst: jnp.ndarray,
    k: int,
    per: str = "dst",
    exclude_self: bool = False,
) -> jnp.ndarray:
    """Boolean (B, Ns, Nd) adjacency from k-nearest selection.

    per='dst': for each destination node, mark its k nearest sources
      (reference ll via knn_graph, rk via knn(x=rec, y=kp)).
    per='src': for each source node, mark its k nearest destinations
      (reference kl via knn(x=lig, y=kp) where kp is the src ntype).
    Rows/cols with fewer than k valid partners get only the valid ones.
    """
    d2 = masked_pair_dist2(x_src, mask_src, x_dst, mask_dst, exclude_self=exclude_self)
    if per == "dst":
        scores = -jnp.swapaxes(d2, 1, 2)  # (B, Nd, Ns)
        n_other = scores.shape[-1]
        k_eff = min(k, n_other)
        top_d2, top_idx = jax.lax.top_k(scores, k_eff)  # (B, Nd, k)
        valid = top_d2 > -_INF * 0.5
        onehot = jax.nn.one_hot(top_idx, n_other, dtype=bool) & valid[..., None]
        adj_dst_src = jnp.any(onehot, axis=2)  # (B, Nd, Ns)
        return jnp.swapaxes(adj_dst_src, 1, 2)
    elif per == "src":
        scores = -d2  # (B, Ns, Nd)
        n_other = scores.shape[-1]
        k_eff = min(k, n_other)
        top_d2, top_idx = jax.lax.top_k(scores, k_eff)
        valid = top_d2 > -_INF * 0.5
        onehot = jax.nn.one_hot(top_idx, n_other, dtype=bool) & valid[..., None]
        return jnp.any(onehot, axis=2)  # (B, Ns, Nd)
    raise ValueError(f"per must be 'dst' or 'src', got {per}")


def knn_indices(
    x_src: jnp.ndarray,
    mask_src: jnp.ndarray,
    x_dst: jnp.ndarray,
    mask_dst: jnp.ndarray,
    k: int,
):
    """For each destination, indices of its k nearest sources.

    Returns (idx (B, Nd, k) int32, dist (B, Nd, k) f32 ascending, valid (B, Nd, k) bool).
    Used e.g. for the k_closest keypoint features with sorted distance
    channels (reference receptor_encoder.py:266-297).
    """
    d2 = masked_pair_dist2(x_src, mask_src, x_dst, mask_dst)  # (B, Ns, Nd)
    scores = -jnp.swapaxes(d2, 1, 2)  # (B, Nd, Ns)
    neg_d2, idx = jax.lax.top_k(scores, min(k, scores.shape[-1]))
    valid = neg_d2 > -_INF * 0.5
    dist = jnp.sqrt(jnp.maximum(-neg_d2, 0.0))
    return idx.astype(jnp.int32), dist, valid


def radius_neighbor_list(
    x_src: jnp.ndarray,
    mask_src: jnp.ndarray,
    x_dst: jnp.ndarray,
    mask_dst: jnp.ndarray,
    radius: float,
    max_neighbors: int,
    exclude_self: bool = False,
):
    """Destination-major neighbor list for radius graphs over large sets.

    Returns (idx (B, Nd, K) int32 source indices, valid (B, Nd, K) bool).
    Keeps the K nearest sources within `radius` of each destination
    (reference torch_cluster radius keeps an arbitrary first
    max_num_neighbors; ours keeps the nearest — documented difference).
    """
    d2 = masked_pair_dist2(x_src, mask_src, x_dst, mask_dst, exclude_self=exclude_self)
    scores = -jnp.swapaxes(d2, 1, 2)  # (B, Nd, Ns)
    k_eff = min(max_neighbors, scores.shape[-1])
    neg_d2, idx = jax.lax.top_k(scores, k_eff)
    within = (-neg_d2) < float(radius) ** 2
    return idx.astype(jnp.int32), within


def onehot_gather(arrays, idx):
    """Gather rows `idx` from each (B, N, ...) array via one-hot MATMULS.

    Exact replacement for take_along_axis on the node axis: the one-hot
    rows select a single element, so each output is one exact f32
    product (bitwise equal to 'take'; tests/test_gather_mode.py). TPU
    dynamic gathers are slow relative to the MXU, so on neighbor-list
    layouts this turns the gather into cheap matmul work.

    idx: (B, ...) int32 into axis 1. Returns gathered arrays with shape
    (B, *idx.shape[1:], *arr.shape[2:]).
    """
    b = idx.shape[0]
    n = arrays[0].shape[1]
    outs = []
    for a in arrays:
        tail = a.shape[2:]
        flat = 1
        for t in tail:
            flat *= t
        # bf16 arrays ride the MXU in bf16 (halves the gather's HBM reads)
        # and the OUTPUT stays bf16: the one-hot contraction sums exactly one
        # nonzero product (1.0 * v), so bf16 accumulation is exact and the
        # result is still bitwise equal to take — no f32 round-trip convert
        # of the gathered pair tensor.
        ad = a.dtype if a.dtype == jnp.bfloat16 else jnp.float32
        oh = jax.nn.one_hot(idx, n, dtype=ad)  # (B, *idx[1:], N) — no flatten:
        # the einsum's free dims merge adjacent major axes (layout-free);
        # an explicit reshape through the tiled minor dims would copy.
        g = jnp.einsum("b...n,bnf->b...f", oh, a.reshape(b, n, flat).astype(ad),
                       preferred_element_type=ad)
        if not tail:
            g = g[..., 0]  # (B, N) input: drop the synthetic flat=1 axis
        elif len(tail) > 1:
            g = g.reshape(*idx.shape, *tail)
        outs.append(g.astype(a.dtype))
    return outs

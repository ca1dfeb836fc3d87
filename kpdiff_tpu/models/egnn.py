"""E(3)-equivariant message passing over padded dense pair grids and
neighbor lists — the TPU replacement for the reference's DGL hetero-EGNN
(models/dynamics.py:9-294 and the EGNN half of models/receptor_encoder.py).

Layout strategy:
  * dense pair grid (B, Ns, Nd): every (src,dst) pair gets a message slot,
    gated by a boolean adjacency. Used for ligand/keypoint edge types whose
    node sets are tiny (<=~128) — the overcompute is cheaper on the MXU
    than any gather/scatter.
  * destination-major neighbor list (B, Nd, K): src indices gathered per
    destination, aggregation is a sum over the K axis (no scatter). Used
    for pocket-scale node sets (rec-rec, all-atom keypoints).

Faithfulness notes (executed-behavior parity with the reference):
  * The reference's branch that was meant to zero coordinate messages on
    kk/lk edges is dead code (`edge_type[1] in ["kk","lk"]` compares one
    char against two-char strings — dynamics.py:115-116), so keypoint
    COORDINATES DO RECEIVE UPDATES when update_kp_feat=True. We replicate
    the executed behavior: coord messages are computed for every edge type.
  * x_diff is (x_src - x_dst) / (dij + 1)   (dynamics.py:160-170).
  * message MLP input is concat(h_src, h_dst, dij) with RAW distance
    (dynamics.py:210-217 computes a norm, not a squared norm, despite the
    "radial ||x_i-x_j||^2" comment).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from kpdiff_tpu.models.nn import MLP, xavier_uniform_scaled


# ---------------------------------------------------------------------------
# Split t-channel math (MXU alignment).
#
# The reference appends the timestep as an extra feature channel, making the
# working width hidden_nf+1 (257 for the shipped 256-wide configs —
# dynamics.py:336-339). 257-wide matmuls pad to 384 lanes / 2x256 contraction
# tiles on the MXU (~2-3x the FLOP-time of aligned 256). These helpers
# compute the SAME y = x @ W (+ b) by block-partitioning W so the only MXU
# matmul is main-width aligned; the last input/output channel rides as a
# rank-1 row / VPU reduction. Exact up to float reassociation.
# ---------------------------------------------------------------------------


def _smatmul(xm, xe, w, b=None):
    """x=(xm|xe) @ w, w: (fm+1, hm+1) -> (ym (…,hm), ye (…,1))."""
    ym = xm @ w[:-1, :-1] + xe * w[-1:, :-1]
    ye = jnp.einsum("...i,i->...", xm, w[:-1, -1])[..., None] + xe * w[-1, -1]
    if b is not None:
        ym = ym + b[:-1]
        ye = ye + b[-1]
    return ym, ye


def _smatvec(xm, xe, w, b=None):
    """x=(xm|xe) @ w, w: (fm+1, 1) -> (…, 1) scalar output (attn/coord_out)."""
    y = jnp.einsum("...i,i->...", xm, w[:-1, 0])[..., None] + xe * w[-1, 0]
    return y if b is None else y + b


# --- squeezed-e-channel variants (round-5 split redesign) -------------------
# The round-2 split kept every e-channel pair tensor as (..., 1): on TPU a
# size-1 minor dim pads to 128 lanes, so each such tensor physically costs
# HALF of a 256-wide bf16 tensor — which is why that layout measured SLOWER
# despite MXU-aligned matmuls (BASELINE.md round-2). These variants keep the
# e-channel SQUEEZED (..., ) so it tiles into the (8,128) plane of the two
# MAJOR dims: physical cost ~1-3% of the main tensor. The e-channel reduce
# (sum over the main width) is written as mul+reduce so XLA can multi-output
# fuse it into the producer of xm instead of re-reading it from HBM.


def _smatmul_sq(xm, xe, w, b=None):
    """x=(xm|xe) @ w, xe squeezed (…,). w: (fm+1, hm+1) -> ym (…,hm), ye (…,)."""
    ym = xm @ w[:-1, :-1] + xe[..., None] * w[-1, :-1]
    ye = (jnp.sum(xm * w[:-1, -1], axis=-1, dtype=jnp.float32).astype(xm.dtype)
          + xe * w[-1, -1])
    if b is not None:
        ym = ym + b[:-1]
        ye = ye + b[-1]
    return ym, ye


def _smatvec_sq(xm, xe, w, b=None):
    """x=(xm|xe) @ w, w: (fm+1, 1) -> squeezed (…,) f32 scalar output."""
    y = (jnp.sum(xm * w[:-1, 0], axis=-1, dtype=jnp.float32)
         + (xe * w[-1, 0]).astype(jnp.float32))
    return y if b is None else y + b[0]


def _gather_nodes(h_src, x_src, idx, mode: str):
    """Gather (features, positions) rows of the source set at `idx`.

    mode='take': jnp.take_along_axis (dynamic-gather HLO).
    mode='onehot': one-hot MATMULS — TPU dynamic gathers are slow relative
      to the MXU, so h[idx] is computed as onehot(idx) @ h instead. The
      one-hot rows have exactly one 1.0, so each output element is a
      single exact product in f32 — bitwise identical to 'take'
      (tests/test_gather_mode.py). Extra MACs are Nd*K*Ns*(F+128pad),
      negligible next to the per-pair MLPs they unblock.

    idx: (B, ..., K) into axis 1 of h_src (B, Ns, F) / x_src (B, Ns, 3).
    Returns h_g (B, ..., K, F), x_g (B, ..., K, 3).
    """
    if mode == "take":
        h_g = jnp.take_along_axis(h_src[:, :, None, :], idx[..., None], axis=1)
        x_g = jnp.take_along_axis(x_src[:, :, None, :], idx[..., None], axis=1)
        return h_g, x_g
    from kpdiff_tpu.ops.neighbors import onehot_gather

    h_g, x_g = onehot_gather([h_src, x_src], idx)
    return h_g, x_g


class EGNNEdgeDense(nn.Module):
    """EGNN messages for one edge type over a dense (B, Ns, Nd) pair grid.

    Computes feature messages (edge MLP + sigmoid soft-attention gate,
    dynamics.py:36-54,110-112) and coordinate messages (coord MLP on the
    same pair input, optionally tanh-clamped, dynamics.py:66-79,114-120),
    then mask-aggregates both onto destinations.

    The first linear of each MLP is factorized into per-node matmuls:
    W @ concat(h_src, h_dst, d) == W_s h_src + W_d h_dst + w d, so the only
    per-pair matmuls are the hidden->hidden layers.
    """

    hidden_size: int
    use_tanh: bool = False
    coords_range: float = 10.0
    coord_hidden_layers: int = 2  # dynamics uses 2 (dynamics.py:71-78); encoder uses 1 (receptor_encoder.py:63-67)
    compute_coord: bool = True  # False replicates fix_pos (receptor_encoder.py:89-90)
    edge_feat_size: int = 0
    dtype: str = "float32"  # compute dtype for the pair MLPs (mixed precision)
    use_pallas: bool = False  # fused VMEM kernel (forward-only; sampling path)
    split_last: bool = False  # MXU-align hidden_nf+1 widths via _smatmul (exact)

    def _linear_params(self, name, d_in, d_out):
        w = self.param(f"{name}_w", nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"), (d_in, d_out))
        b = self.param(
            f"{name}_b",
            lambda k, s: jnp.asarray(nn.initializers.uniform(scale=2.0)(k, s) - 1.0, jnp.float32)
            / jnp.sqrt(jnp.asarray(d_in, jnp.float32)),
            (d_out,),
        )
        return w, b

    def _first_layer_params(self, name, f_in, h):
        w_s = self.param(f"{name}_w_src", nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"), (f_in, h))
        w_d = self.param(f"{name}_w_dst", nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"), (f_in, h))
        w_dij = self.param(f"{name}_w_dij", nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"), (1 + self.edge_feat_size, h))
        fan_in = 2 * f_in + 1 + self.edge_feat_size
        b = self.param(
            f"{name}_b",
            lambda k, s: jnp.asarray(nn.initializers.uniform(scale=2.0)(k, s) - 1.0, jnp.float32)
            / jnp.sqrt(jnp.asarray(fan_in, jnp.float32)),
            (h,),
        )
        return w_s, w_d, w_dij, b

    @nn.compact
    def __call__(
        self,
        h_src: jnp.ndarray,  # (B, Ns, F)
        h_dst: jnp.ndarray,  # (B, Nd, F)
        x_src: jnp.ndarray,  # (B, Ns, 3)
        x_dst: jnp.ndarray,  # (B, Nd, 3)
        adj: jnp.ndarray,  # (B, Ns, Nd) bool
        edge_feat: Optional[jnp.ndarray] = None,  # (B, Ns, Nd, E)
    ):
        f_in = h_src.shape[-1]
        h = self.hidden_size
        cd = jnp.dtype(self.dtype)

        e_ws, e_wd, e_wdij, e_b = self._first_layer_params("edge", f_in, h)
        l2_w, l2_b = self._linear_params("edge_lin2", h, h)
        at_w, at_b = self._linear_params("attn", h, 1)
        if self.compute_coord:
            c_ws, c_wd, c_wdij, c_b = self._first_layer_params("coord", f_in, h)
            c2 = [self._linear_params(f"coord_lin{i + 2}", h, h) for i in range(self.coord_hidden_layers - 1)]
            w_out = self.param("coord_out_w", xavier_uniform_scaled(0.001), (h, 1))

        pallas_ok = (
            self.use_pallas
            and self.compute_coord
            and self.coord_hidden_layers == 2
            and self.edge_feat_size == 0
            and edge_feat is None
        )
        if pallas_ok:
            from kpdiff_tpu.ops.pallas.egnn_edge import fused_dense_edge_split

            # the fused kernel always runs the split (MXU-aligned) layout:
            # per-node first-layer projections here (cheap), whole per-pair
            # pipeline in VMEM there. First-layer bias folds into the dst
            # projections.
            hs_m, hs_e = h_src[..., :-1], h_src[..., -1:]
            hd_m, hd_e = h_dst[..., :-1], h_dst[..., -1:]
            ae_s_m, ae_s_e = _smatmul(hs_m, hs_e, e_ws)
            ae_d_m, ae_d_e = _smatmul(hd_m, hd_e, e_wd, e_b)
            ac_s_m, ac_s_e = _smatmul(hs_m, hs_e, c_ws)
            ac_d_m, ac_d_e = _smatmul(hd_m, hd_e, c_wd, c_b)
            c2_w, c2_b = c2[0]
            return fused_dense_edge_split(
                ae_s_m, ae_s_e, ae_d_m, ae_d_e,
                ac_s_m, ac_s_e, ac_d_m, ac_d_e,
                e_wdij, c_wdij,
                l2_w, l2_b, at_w, at_b, c2_w, c2_b, w_out,
                x_src, x_dst, adj,
                use_tanh=self.use_tanh,
                coords_range=self.coords_range,
                compute_dtype=cd,
            )

        diff = x_src[:, :, None, :] - x_dst[:, None, :, :]  # (B,Ns,Nd,3)
        # padded nodes can carry garbage positions; clean them so no inf/nan
        diff = jnp.where(adj[..., None], diff, 0.0)
        dij = jnp.linalg.norm(diff + 1e-30, axis=-1, keepdims=True)  # (B,Ns,Nd,1)
        x_unit = diff / (dij + 1.0)
        scalars_in = dij if edge_feat is None else jnp.concatenate([dij, edge_feat], axis=-1)

        if self.split_last:
            # --- MXU-aligned path, squeezed e-channel (round-5 redesign):
            # pair tensors stay hidden-1 (256) wide so bf16 (16,128) tiles
            # are exact — 2/3 the physical HBM bytes of the 257-wide layout,
            # whose minor dim pads to 384 lanes. The t-channel rides as
            # rank-3 (B,Ns,Nd) tensors with no lane dim of their own (the
            # round-2 split kept (…,1) tensors, which pad to 128 lanes and
            # cost half a 256-wide tensor per pass — that layout lost).
            hs_m, hs_e = h_src[..., :-1].astype(cd), h_src[..., -1].astype(cd)
            hd_m, hd_e = h_dst[..., :-1].astype(cd), h_dst[..., -1].astype(cd)
            sc = scalars_in.astype(cd)

            def pair_preact_split(w_s, w_d, w_dij, b):
                # per-node projections (cheap), then broadcast-add per pair
                w_dij, b = w_dij.astype(cd), b.astype(cd)
                s_m, s_e = _smatmul_sq(hs_m, hs_e, w_s.astype(cd))
                d_m, d_e = _smatmul_sq(hd_m, hd_e, w_d.astype(cd))
                pm = (s_m[:, :, None, :] + d_m[:, None, :, :]
                      + sc @ w_dij[:, :-1] + b[:-1])
                pe = (s_e[:, :, None] + d_e[:, None, :]
                      + (sc @ w_dij[:, -1:])[..., 0] + b[-1])
                return pm, pe

            m_m, m_e = pair_preact_split(e_ws, e_wd, e_wdij, e_b)
            m_m, m_e = nn.silu(m_m), nn.silu(m_e)
            m_m, m_e = _smatmul_sq(m_m, m_e, l2_w.astype(cd), l2_b.astype(cd))
            m_m, m_e = nn.silu(m_m), nn.silu(m_e)
            gate = nn.sigmoid(_smatvec_sq(m_m, m_e, at_w.astype(cd), at_b.astype(cd)))
            coeff = adj.astype(m_m.dtype) * gate.astype(m_m.dtype)
            agg_h = jnp.concatenate([
                jnp.einsum("bsd,bsdh->bdh", coeff, m_m, preferred_element_type=jnp.float32),
                jnp.einsum("bsd,bsd->bd", coeff, m_e, preferred_element_type=jnp.float32)[..., None],
            ], axis=-1)
            if not self.compute_coord:
                return agg_h, jnp.zeros_like(x_dst)

            c_m, c_e = pair_preact_split(c_ws, c_wd, c_wdij, c_b)
            c_m, c_e = nn.silu(c_m), nn.silu(c_e)
            for cw, cb in c2[:-1]:
                c_m, c_e = _smatmul_sq(c_m, c_e, cw.astype(cd), cb.astype(cd))
                c_m, c_e = nn.silu(c_m), nn.silu(c_e)
            if c2:
                cw, cb = c2[-1]
                z_m, z_e = _smatmul_sq(c_m, c_e, cw.astype(cd), cb.astype(cd))
                scalar = _smatvec_sq(nn.silu(z_m), nn.silu(z_e), w_out.astype(cd))
            else:
                scalar = _smatvec_sq(c_m, c_e, w_out.astype(cd))
            if self.use_tanh:
                scalar = jnp.tanh(scalar) * self.coords_range
            coeff_x = adj.astype(jnp.float32) * scalar / (dij[..., 0] + 1.0)
            agg_x = jnp.einsum("bsd,bsdc->bdc", coeff_x, diff)
            return agg_h, agg_x

        def pair_preact(w_s, w_d, w_dij, b):
            return (
                (h_src.astype(cd) @ w_s.astype(cd))[:, :, None, :]
                + (h_dst.astype(cd) @ w_d.astype(cd))[:, None, :, :]
                + scalars_in.astype(cd) @ w_dij.astype(cd)
                + b.astype(cd)
            )

        # feature messages: Linear→SiLU→Linear→SiLU, then sigmoid gate.
        # The gate is folded into the aggregation coefficients so the gated
        # message tensor never materializes in HBM (saves 2 full pair-tensor
        # passes per chain; the sampler is HBM-bandwidth-bound).
        m = nn.silu(pair_preact(e_ws, e_wd, e_wdij, e_b))
        m = nn.silu(m @ l2_w.astype(cd) + l2_b.astype(cd))
        # attention matvec written as mul+reduce, NOT a dot: XLA sibling-fuses
        # the reduce into m's producer (multi-output fusion), removing one
        # full HBM read of the pair tensor that a (H,1) dot would need.
        # Products in compute dtype, f32 accumulation — same precision
        # contract as the MXU dot, reassociation only.
        gate = nn.sigmoid(
            jnp.sum(m * at_w[:, 0].astype(cd), axis=-1, dtype=jnp.float32)
            + at_b[0])

        coeff = adj.astype(m.dtype) * gate.astype(m.dtype)
        agg_h = jnp.einsum("bsd,bsdh->bdh", coeff, m, preferred_element_type=jnp.float32)

        if not self.compute_coord:
            return agg_h, jnp.zeros_like(x_dst)

        c = nn.silu(pair_preact(c_ws, c_wd, c_wdij, c_b))
        for cw, cb in c2[:-1]:
            c = nn.silu(c @ cw.astype(cd) + cb.astype(cd))
        if c2:
            cw, cb = c2[-1]
            c = c @ cw.astype(cd) + cb.astype(cd)
            # final silu + output matvec as one fused mul+reduce: the last
            # hidden pair tensor never round-trips through HBM (it lives only
            # inside the dot's output fusion).
            # xavier_uniform gain 0.001 on the output layer (dynamics.py:69-70)
            scalar = jnp.sum(nn.silu(c) * w_out[:, 0].astype(cd), axis=-1, dtype=jnp.float32)
        else:
            scalar = jnp.sum(c * w_out[:, 0].astype(cd), axis=-1, dtype=jnp.float32)
        if self.use_tanh:
            scalar = jnp.tanh(scalar) * self.coords_range
        # fold scalar, adj and the (d+1) normalizer into one coefficient and
        # aggregate the raw diffs: x_unit/msg_x never materialize
        coeff_x = adj.astype(jnp.float32) * scalar / (dij[..., 0] + 1.0)
        agg_x = jnp.einsum("bsd,bsdc->bdc", coeff_x, diff)
        return agg_h, agg_x


class EGNNEdgeKNNPairs(nn.Module):
    """EGNN edge math over a kNN pair list anchored at one node set.

    For knn-built kl edges (each keypoint -> its kl_k nearest ligand atoms,
    dynamics.py:400-404) the true edge count is K*kl_k, ~10x smaller than
    the dense K x Nl grid. Both kl and its reverse lk live on the SAME
    (B, K, k) structure of ligand indices:
      * anchor_is_src=True  (kl): anchor (kp) sends to the gathered nodes;
        aggregation scatters to the gathered side via a one-hot matmul.
      * anchor_is_src=False (lk): gathered nodes send to the anchor;
        aggregation is a masked sum over the k axis.
    Identical parameter layout to EGNNEdgeDense (swap-in replacement).

    Internal layout is k-MAJOR: every pair tensor is (B, k, K, H), not
    (B, K, k, H). TPU tiles the two minor dims, so a (k=5, H) minor pad
    to the (16, 128·) tile inflates physical pair bytes ~3x and every
    reshape between (K, k) and K*k relayouts through the tile — measured
    as the convert/copy rows of benchmarks/hlo_bytes.py on the flagship.
    With (K, H) minor the tensors tile cleanly and the aggregation
    einsums merge adjacent major axes for free. Exact math — layout only.
    """

    hidden_size: int
    anchor_is_src: bool
    use_tanh: bool = False
    coords_range: float = 10.0
    dtype: str = "float32"
    split_last: bool = False  # MXU-align hidden_nf+1 widths via _smatmul (exact)
    gather_mode: str = "take"  # 'onehot': gathers as one-hot matmuls (exact)

    _linear_params = EGNNEdgeDense._linear_params
    _first_layer_params = EGNNEdgeDense._first_layer_params
    edge_feat_size: int = 0  # consumed by _first_layer_params

    @nn.compact
    def __call__(
        self,
        h_anchor: jnp.ndarray,  # (B, K, F)
        h_other: jnp.ndarray,  # (B, N, F)
        x_anchor: jnp.ndarray,  # (B, K, 3)
        x_other: jnp.ndarray,  # (B, N, 3)
        idx: jnp.ndarray,  # (B, K, k) indices into the other set
        valid: jnp.ndarray,  # (B, K, k)
    ):
        f_in = h_anchor.shape[-1]
        h = self.hidden_size
        cd = jnp.dtype(self.dtype)
        b, K, k = idx.shape
        n_other = h_other.shape[1]

        e_ws, e_wd, e_wdij, e_b = self._first_layer_params("edge", f_in, h)
        l2_w, l2_b = self._linear_params("edge_lin2", h, h)
        at_w, at_b = self._linear_params("attn", h, 1)
        c_ws, c_wd, c_wdij, c_b = self._first_layer_params("coord", f_in, h)
        c2_w, c2_b = self._linear_params("coord_lin2", h, h)
        w_out = self.param("coord_out_w", xavier_uniform_scaled(0.001), (h, 1))

        if self.anchor_is_src:
            w_anchor, w_gathered = e_ws, e_wd
            cw_anchor, cw_gathered = c_ws, c_wd
        else:
            w_anchor, w_gathered = e_wd, e_ws
            cw_anchor, cw_gathered = c_wd, c_ws

        # k-major layout (see class docstring): every pair tensor below is
        # (B, k, K, ·) so the tiled minor dims are (K, H)
        idx_t = jnp.swapaxes(idx, 1, 2)  # (B, k, K)
        valid_t = jnp.swapaxes(valid, 1, 2)  # (B, k, K)

        if self.gather_mode == "proj":
            # project-before-gather (see EGNNEdgeNbrList): both chains'
            # gathered-side first matmuls run at node level, one one-hot
            # matmul pulls the stacked 2H projections.
            if self.split_last:
                raise ValueError("gather_mode='proj' is incompatible with split_last")
            from kpdiff_tpu.ops.neighbors import onehot_gather

            w_stack = jnp.concatenate([w_gathered.astype(cd), cw_gathered.astype(cd)], axis=1)
            proj_other = h_other.astype(cd) @ w_stack  # (B, N, 2H)
            proj_g, x_g = onehot_gather([proj_other, x_other], idx_t)
            h_g = None
        else:
            # gather the features pre-cast to the compute dtype: elementwise
            # cast commutes with row selection, and a bf16 gather writes the
            # pair tensor in bf16 directly (no f32 round-trip convert)
            h_g, x_g = _gather_nodes(h_other.astype(cd), x_other, idx_t, self.gather_mode)
            proj_g = None

        x_a = x_anchor[:, None, :, :]  # (B, 1, K, 3) broadcasts over k
        if self.anchor_is_src:
            diff = x_a - x_g  # x_src - x_dst
        else:
            diff = x_g - x_a

        diff = jnp.where(valid_t[..., None], diff, 0.0)
        dij = jnp.linalg.norm(diff + 1e-30, axis=-1, keepdims=True)  # (B,k,K,1)

        if self.split_last:
            # squeezed e-channel split (see EGNNEdgeDense): pair tensors stay
            # hidden-1 wide; the e-channel rides as (B,k,K) with no lane dim
            ha_m, ha_e = h_anchor[..., :-1].astype(cd), h_anchor[..., -1].astype(cd)
            hg_m, hg_e = h_g[..., :-1], h_g[..., -1]
            dij_c = dij.astype(cd)  # (B,k,K,1)
            dij_sq = dij_c[..., 0]  # (B,k,K)

            def preact_split(wa, wg, wdij, bias):
                wdij, bias = wdij.astype(cd), bias.astype(cd)
                a_m, a_e = _smatmul_sq(ha_m, ha_e, wa.astype(cd))
                g_m, g_e = _smatmul_sq(hg_m, hg_e, wg.astype(cd))
                pm = (a_m[:, None, :, :] + g_m
                      + dij_c * wdij[0, :-1] + bias[:-1])
                pe = (a_e[:, None, :] + g_e
                      + dij_sq * wdij[0, -1] + bias[-1])
                return pm, pe

            m_m, m_e = preact_split(w_anchor, w_gathered, e_wdij, e_b)
            m_m, m_e = nn.silu(m_m), nn.silu(m_e)
            m_m, m_e = _smatmul_sq(m_m, m_e, l2_w.astype(cd), l2_b.astype(cd))
            m_m, m_e = nn.silu(m_m), nn.silu(m_e)
            gate = nn.sigmoid(_smatvec_sq(m_m, m_e, at_w.astype(cd), at_b.astype(cd)))
            coeff = gate.astype(m_m.dtype) * valid_t.astype(m_m.dtype)  # (B,k,K)

            c_m, c_e = preact_split(cw_anchor, cw_gathered, c_wdij, c_b)
            c_m, c_e = nn.silu(c_m), nn.silu(c_e)
            z_m, z_e = _smatmul_sq(c_m, c_e, c2_w.astype(cd), c2_b.astype(cd))
            scalar = _smatvec_sq(nn.silu(z_m), nn.silu(z_e), w_out.astype(cd))
            if self.use_tanh:
                scalar = jnp.tanh(scalar) * self.coords_range
            coeff_x = (valid_t.astype(jnp.float32) * scalar
                       / (dij[..., 0] + 1.0))  # (B,k,K)

            if self.anchor_is_src:
                onehot = jax.nn.one_hot(idx_t, n_other, dtype=m_m.dtype)  # (B,k,K,N)
                agg_h = jnp.concatenate([
                    jnp.einsum("bken,bke,bkeh->bnh", onehot, coeff, m_m,
                               preferred_element_type=jnp.float32),
                    jnp.einsum("bken,bke,bke->bn", onehot, coeff, m_e,
                               preferred_element_type=jnp.float32)[..., None],
                ], axis=-1)
                agg_x = jnp.einsum("bken,bke,bkec->bnc", onehot.astype(jnp.float32),
                                   coeff_x, diff)
                return agg_h, agg_x
            agg_h = jnp.concatenate([
                jnp.einsum("bke,bkeh->beh", coeff, m_m,
                           preferred_element_type=jnp.float32),
                jnp.einsum("bke,bke->be", coeff, m_e,
                           preferred_element_type=jnp.float32)[..., None],
            ], axis=-1)
            agg_x = jnp.einsum("bke,bkec->bec", coeff_x, diff)
            return agg_h, agg_x

        def preact(wa, wg, wdij, bias, chain=0):
            if proj_g is not None:  # proj mode: gathered projections, slice per chain
                g_term = proj_g[..., chain * h : (chain + 1) * h]
            else:
                g_term = h_g @ wg.astype(cd)
            return (
                (h_anchor.astype(cd) @ wa.astype(cd))[:, None, :, :]
                + g_term
                + dij.astype(cd) * wdij.astype(cd)
                + bias.astype(cd)
            )

        # gate and validity fold into the aggregation COEFFICIENTS (same
        # trick as EGNNEdgeDense): the gated message tensor never
        # materializes — the lin2 output m is the only pair tensor each
        # chain writes, and the reduce/one-hot contraction reads it once.
        m = nn.silu(preact(w_anchor, w_gathered, e_wdij[0][None, None, None], e_b))
        m = nn.silu(m @ l2_w.astype(cd) + l2_b.astype(cd))
        # attention matvec as fused mul+reduce (see EGNNEdgeDense): one fewer
        # full read of the pair tensor than a (H,1) dot
        gate = nn.sigmoid(
            jnp.sum(m * at_w[:, 0].astype(cd), axis=-1, dtype=jnp.float32)
            + at_b[0])  # (B,k,K)
        coeff = gate.astype(m.dtype) * valid_t.astype(m.dtype)  # (B,k,K)

        c = nn.silu(preact(cw_anchor, cw_gathered, c_wdij[0][None, None, None], c_b, chain=1))
        c = c @ c2_w.astype(cd) + c2_b.astype(cd)
        # final silu + output matvec fused into the dot's output fusion: the
        # last hidden pair tensor never round-trips through HBM
        scalar = jnp.sum(
            (nn.silu(c) * w_out[:, 0].astype(cd)).astype(jnp.float32), axis=-1)
        if self.use_tanh:
            scalar = jnp.tanh(scalar) * self.coords_range
        # fold scalar, validity and the (d+1) normalizer into one coefficient
        # over the raw diffs (already oriented x_src - x_dst in both
        # directions above): x_unit/msg_x never materialize
        coeff_x = (valid_t.astype(jnp.float32) * scalar
                   / (dij[..., 0] + 1.0))  # (B,k,K)

        if self.anchor_is_src:
            # scatter to the gathered (other) side via one-hot matmul; the
            # einsum merges the adjacent (k, K) major axes without a reshape
            onehot = jax.nn.one_hot(idx_t, n_other, dtype=m.dtype)  # (B,k,K,N)
            agg_h = jnp.einsum("bken,bke,bkeh->bnh", onehot, coeff, m,
                               preferred_element_type=jnp.float32)
            agg_x = jnp.einsum("bken,bke,bkec->bnc", onehot.astype(jnp.float32),
                               coeff_x, diff)
            return agg_h, agg_x
        agg_h = jnp.einsum("bke,bkeh->beh", coeff, m,
                           preferred_element_type=jnp.float32)
        agg_x = jnp.einsum("bke,bkec->bec", coeff_x, diff)
        return agg_h, agg_x


class EGNNEdgeNbrList(nn.Module):
    """Same EGNN edge math over a destination-major neighbor list.

    nbr_idx (B, Nd, K) indexes into the source set; nbr_valid masks slots.
    Aggregation is a masked sum over K — no scatter.
    """

    hidden_size: int
    use_tanh: bool = False
    coords_range: float = 10.0
    coord_hidden_layers: int = 2
    compute_coord: bool = True
    edge_feat_size: int = 0
    dtype: str = "float32"
    split_last: bool = False  # MXU-align hidden_nf+1 widths via _smatmul (exact)
    gather_mode: str = "take"  # 'onehot': gathers as one-hot matmuls (exact)

    _linear_params = EGNNEdgeDense._linear_params
    _first_layer_params = EGNNEdgeDense._first_layer_params

    @nn.compact
    def __call__(
        self,
        h_src: jnp.ndarray,  # (B, Ns, F)
        h_dst: jnp.ndarray,  # (B, Nd, F)
        x_src: jnp.ndarray,
        x_dst: jnp.ndarray,
        nbr_idx: jnp.ndarray,  # (B, Nd, K) int32
        nbr_valid: jnp.ndarray,  # (B, Nd, K) bool
        edge_feat: Optional[jnp.ndarray] = None,  # (B, Nd, K, E)
    ):
        f_in = h_src.shape[-1]
        h = self.hidden_size
        cd = jnp.dtype(self.dtype)

        e_ws, e_wd, e_wdij, e_b = self._first_layer_params("edge", f_in, h)
        l2_w, l2_b = self._linear_params("edge_lin2", h, h)
        at_w, at_b = self._linear_params("attn", h, 1)
        if self.compute_coord:
            c_ws, c_wd, c_wdij, c_b = self._first_layer_params("coord", f_in, h)
            c2 = [self._linear_params(f"coord_lin{i + 2}", h, h) for i in range(self.coord_hidden_layers - 1)]
            w_out = self.param("coord_out_w", xavier_uniform_scaled(0.001), (h, 1))

        if self.gather_mode == "proj":
            # project-before-gather: onehot @ (h @ W) == (onehot @ h) @ W, so
            # the gathered-side first-layer matmuls of BOTH chains run once at
            # node level (stacked into a single matmul) and one one-hot matmul
            # pulls the 2H-wide projections — the F-wide gathered-h tensor and
            # the per-pair first matmuls never exist. Exact math; values equal
            # to 'take' up to matmul tiling (tests/test_gather_mode.py).
            if self.split_last:
                raise ValueError("gather_mode='proj' is incompatible with split_last")
            from kpdiff_tpu.ops.neighbors import onehot_gather

            stack = [e_ws] + ([c_ws] if self.compute_coord else [])
            w_stack = jnp.concatenate([w.astype(cd) for w in stack], axis=1)
            proj_src = h_src.astype(cd) @ w_stack  # (B, Ns, H or 2H)
            proj_nbr, x_nbr = onehot_gather([proj_src, x_src], nbr_idx)
            h_nbr = None
        else:
            h_nbr, x_nbr = _gather_nodes(h_src, x_src, nbr_idx, self.gather_mode)  # (B,Nd,K,F/3)
        diff = x_nbr - x_dst[:, :, None, :]
        diff = jnp.where(nbr_valid[..., None], diff, 0.0)
        dij = jnp.linalg.norm(diff + 1e-30, axis=-1, keepdims=True)
        x_unit = diff / (dij + 1.0)

        if self.split_last:
            # squeezed e-channel split (see EGNNEdgeDense)
            hn_m, hn_e = h_nbr[..., :-1].astype(cd), h_nbr[..., -1].astype(cd)
            hd_m, hd_e = h_dst[..., :-1].astype(cd), h_dst[..., -1].astype(cd)
            sc = (dij if edge_feat is None
                  else jnp.concatenate([dij, edge_feat], axis=-1)).astype(cd)

            def preact_split(w_s, w_d, w_dij, bias):
                w_dij, bias = w_dij.astype(cd), bias.astype(cd)
                n_m, n_e = _smatmul_sq(hn_m, hn_e, w_s.astype(cd))
                d_m, d_e = _smatmul_sq(hd_m, hd_e, w_d.astype(cd))
                pm = n_m + d_m[:, :, None, :] + sc @ w_dij[:, :-1] + bias[:-1]
                pe = n_e + d_e[:, :, None] + (sc @ w_dij[:, -1:])[..., 0] + bias[-1]
                return pm, pe

            m_m, m_e = preact_split(e_ws, e_wd, e_wdij, e_b)
            m_m, m_e = nn.silu(m_m), nn.silu(m_e)
            m_m, m_e = _smatmul_sq(m_m, m_e, l2_w.astype(cd), l2_b.astype(cd))
            m_m, m_e = nn.silu(m_m), nn.silu(m_e)
            gate = nn.sigmoid(_smatvec_sq(m_m, m_e, at_w.astype(cd), at_b.astype(cd)))
            coeff = gate.astype(m_m.dtype) * nbr_valid.astype(m_m.dtype)  # (B,Nd,K)
            agg_h = jnp.concatenate([
                jnp.sum(m_m * coeff[..., None], axis=2, dtype=jnp.float32),
                jnp.sum(m_e * coeff, axis=2, dtype=jnp.float32)[..., None],
            ], axis=-1)
            if not self.compute_coord:
                return agg_h, jnp.zeros_like(x_dst)
            c_m, c_e = preact_split(c_ws, c_wd, c_wdij, c_b)
            c_m, c_e = nn.silu(c_m), nn.silu(c_e)
            for cw, cb in c2[:-1]:
                c_m, c_e = _smatmul_sq(c_m, c_e, cw.astype(cd), cb.astype(cd))
                c_m, c_e = nn.silu(c_m), nn.silu(c_e)
            if c2:
                cw, cb = c2[-1]
                z_m, z_e = _smatmul_sq(c_m, c_e, cw.astype(cd), cb.astype(cd))
                scalar = _smatvec_sq(nn.silu(z_m), nn.silu(z_e), w_out.astype(cd))
            else:
                scalar = _smatvec_sq(c_m, c_e, w_out.astype(cd))
            if self.use_tanh:
                scalar = jnp.tanh(scalar) * self.coords_range
            coeff_x = nbr_valid.astype(jnp.float32) * scalar / (dij[..., 0] + 1.0)
            agg_x = jnp.einsum("bdk,bdkc->bdc", coeff_x, diff)
            return agg_h, agg_x

        def pair_preact(w_s, w_d, w_dij, b, chain=0):
            scalars = dij if edge_feat is None else jnp.concatenate([dij, edge_feat], axis=-1)
            if h_nbr is None:  # proj mode: gathered projections, slice per chain
                src_term = proj_nbr[..., chain * h : (chain + 1) * h]
            else:
                src_term = h_nbr.astype(cd) @ w_s.astype(cd)
            return (
                src_term
                + (h_dst.astype(cd) @ w_d.astype(cd))[:, :, None, :]
                + scalars.astype(cd) @ w_dij.astype(cd)
                + b.astype(cd)
            )

        m = nn.silu(pair_preact(e_ws, e_wd, e_wdij, e_b))
        m = nn.silu(m @ l2_w.astype(cd) + l2_b.astype(cd))
        # attention matvec as fused mul+reduce (see EGNNEdgeDense): one fewer
        # full read of the pair tensor than a (H,1) dot
        gate = nn.sigmoid(
            jnp.sum(m * at_w[:, 0].astype(cd), axis=-1, dtype=jnp.float32)
            + at_b[0])  # (B,Nd,K)
        coeff = gate.astype(m.dtype) * nbr_valid.astype(m.dtype)
        agg_h = jnp.sum(m * coeff[..., None], axis=2, dtype=jnp.float32)

        if not self.compute_coord:
            return agg_h, jnp.zeros_like(x_dst)

        c = nn.silu(pair_preact(c_ws, c_wd, c_wdij, c_b, chain=1))
        for cw, cb in c2[:-1]:
            c = nn.silu(c @ cw.astype(cd) + cb.astype(cd))
        if c2:
            cw, cb = c2[-1]
            c = c @ cw.astype(cd) + cb.astype(cd)
            # final silu + output matvec fused into the dot's output fusion
            scalar = jnp.sum(nn.silu(c) * w_out[:, 0].astype(cd), axis=-1, dtype=jnp.float32)
        else:
            scalar = jnp.sum(c * w_out[:, 0].astype(cd), axis=-1, dtype=jnp.float32)
        if self.use_tanh:
            scalar = jnp.tanh(scalar) * self.coords_range
        # fold scalar, validity and the (d+1) normalizer into one coefficient
        # over the raw diffs: x_unit/msg_x never materialize
        coeff_x = (nbr_valid.astype(jnp.float32) * scalar / (dij[..., 0] + 1.0))
        agg_x = jnp.einsum("bdk,bdkc->bdc", coeff_x, diff)
        return agg_h, agg_x


class NodeUpdate(nn.Module):
    """phi_h residual update + optional LayerNorm (dynamics.py:57-64,199-205)."""

    hidden_size: int
    out_size: int
    norm: bool = False
    dtype: str = "float32"

    @nn.compact
    def __call__(self, h, h_agg):
        inp = jnp.concatenate([h, h_agg], axis=-1)
        upd = MLP([self.hidden_size, self.out_size], ["silu", ""], dtype=self.dtype, name="node_mlp")(inp)
        out = h + upd.astype(h.dtype)
        if self.norm:
            out = nn.LayerNorm(epsilon=1e-5)(out)
        return out

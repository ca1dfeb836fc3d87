"""Learned GVP receptor encoder — TPU re-design of the reference
ReceptorEncoderGVP / KeypointInitializer / GVPEdgeConv
(models/receptor_encoder_gvp.py:15-322, models/gvp.py:170-341).

Layout: rr and rk edges run over destination-major neighbor lists
(pocket-scale sets); keypoint attention positioning is a dense masked
softmax over (B, K, Nr), replacing the segment_csr construction
(receptor_encoder_gvp.py:69-84).

Faithfulness notes:
  * KeypointInitializer uses SEPARATE query/key projections (src_net /
    dst_net — receptor_encoder_gvp.py:27-28), unlike the EGNN RecKeyConv's
    fc_src-reuse bug.
  * kp scalars/vectors initialize to ZERO (receptor_encoder_gvp.py:89-92);
    the keypoint-embedding features only steer the attention.
  * z normalization (message_norm==0) is edges/nodes with NO +1
    (receptor_encoder_gvp.py:243-246,266-269).
  * rbf_dmax comes from graph_cutoffs: 'rr' for rr convs, 'rk' for rk
    convs (receptor_encoder_gvp.py:184,209 — note cutoffs['rk'] is 100 in
    the shipped configs; replicated verbatim).
  * rk convs use dst feats from the SECOND conv on (receptor_encoder_gvp.py:192-197).
  * the reference's use_sameres_feat path reads edge data key 'a' which is
    never populated ('same_res' is the stored key) — it would KeyError if
    enabled; all shipped GVP configs have it false. We implement the
    intended same-residue feature from rec_res_idx.
"""
from __future__ import annotations

from typing import Dict, Union

import flax.linen as nn
import jax.numpy as jnp

from kpdiff_tpu.models.complex import PaddedComplex
from kpdiff_tpu.models.gvp import (
    GVPChain,
    GVPEdgeMessagesDense,
    GVPEdgeMessagesNbr,
    GVPLayerNorm,
    _update_specs,
    gvp_dropout,
    unflatten_vec,
)
from kpdiff_tpu.models.nn import MLP, TorchLinear
from kpdiff_tpu.ops.geometry import masked_mean
from kpdiff_tpu.ops.neighbors import knn_indices, radius_neighbor_list

_NEG = -1e30


class GVPEdgeConvNbr(nn.Module):
    """Single-edge-type GVP conv: messages + residual dst update
    (gvp.py:170-341) over a neighbor list."""

    scalar_size: int
    vector_size: int
    n_message_gvps: int = 1
    n_update_gvps: int = 1
    use_dst_feats: bool = False
    edge_feat_size: int = 0
    rbf_dmax: float = 15.0
    rbf_dim: int = 16
    message_norm: Union[float, str] = 10
    dropout: float = 0.0
    dtype: str = "float32"
    layout: str = "nbr"  # 'nbr' (idx, valid) | 'block' (banded adj,) — same params
    vec_layout: str = "vc"  # 'flat': vectors are (..., 3V) v-major
    gather_mode: str = "take"  # 'onehot': nbr gathers as one-hot matmuls (exact)

    @nn.compact
    def __call__(self, src_feats, dst_feats, edges, z, mask_dst, edge_feat=None, deterministic=True):
        h_s, x_s, v_s = src_feats
        h_d, x_d, v_d = dst_feats
        flat = self.vec_layout == "flat"
        agg = "mean" if self.message_norm == "mean" else "sum"
        common = dict(
            scalar_size=self.scalar_size,
            vector_size=self.vector_size,
            n_message_gvps=self.n_message_gvps,
            rbf_dmax=self.rbf_dmax,
            rbf_dim=self.rbf_dim,
            use_dst_feats=self.use_dst_feats,
            edge_feat_size=self.edge_feat_size,
            agg=agg,
            dtype=self.dtype,
            vec_layout=self.vec_layout,
            name="edge",
        )
        if self.layout == "block":
            from kpdiff_tpu.ops.spatial import block_windows

            (adj,) = edges  # (B, nt, 3T, T); src set == dst set (rr)
            b, nt, w, tile = adj.shape
            N, S_ = h_s.shape[1], h_s.shape[-1]
            hw = block_windows(h_s, tile).reshape(b * nt, w, S_)
            xw = block_windows(x_s, tile).reshape(b * nt, w, 3)
            ef = None if edge_feat is None else edge_feat.reshape(b * nt, w, tile, -1)
            if flat:
                V3 = v_s.shape[-1]
                vw = block_windows(v_s, tile).reshape(b * nt, w, V3)
                vt = v_d.reshape(b * nt, tile, V3)
            else:
                V_ = v_s.shape[-2]
                vw = block_windows(v_s, tile).reshape(b * nt, w, V_, 3)
                vt = v_d.reshape(b * nt, tile, V_, 3)
            s_msg, v_msg = GVPEdgeMessagesDense(**common)(
                hw, vw, xw,
                h_d.reshape(b * nt, tile, S_), vt, x_d.reshape(b * nt, tile, 3),
                adj.reshape(b * nt, w, tile), ef,
            )
            s_msg = s_msg.reshape(b, N, S_)
            v_msg = v_msg.reshape(b, N, V3) if flat else v_msg.reshape(b, N, V_, 3)
        else:
            nbr_idx, nbr_valid = edges
            s_msg, v_msg = GVPEdgeMessagesNbr(gather_mode=self.gather_mode, **common)(
                h_s, v_s, x_s, h_d, v_d, x_d, nbr_idx, nbr_valid, edge_feat
            )

        s_msg = s_msg / z
        if flat:
            v_msg = v_msg / z
        else:
            v_msg = v_msg / (z if isinstance(z, float) else z[..., None])

        if self.dropout > 0 and not deterministic:
            s_msg, v_msg = gvp_dropout(self.make_rng("dropout"), s_msg, v_msg, self.dropout,
                                       deterministic, vec_layout=self.vec_layout)

        h = h_d + s_msg
        v = v_d + v_msg
        h, v = GVPLayerNorm(vec_layout=self.vec_layout, name="message_norm")(h, v)

        s_res, v_res = GVPChain(_update_specs(self.scalar_size, self.vector_size, self.n_update_gvps),
                                dtype=self.dtype, vec_layout=self.vec_layout, name="update")((h, v))
        s_res = s_res.astype(h.dtype)
        v_res = v_res.astype(v.dtype)
        if self.dropout > 0 and not deterministic:
            s_res, v_res = gvp_dropout(self.make_rng("dropout"), s_res, v_res, self.dropout,
                                       deterministic, vec_layout=self.vec_layout)
        h = h + s_res
        v = v + v_res
        h, v = GVPLayerNorm(vec_layout=self.vec_layout, name="update_norm")(h, v)

        m = mask_dst[..., None].astype(h.dtype)
        return h * m, (v * m) if flat else (v * m[..., None])


class GVPReceptorEncoder(nn.Module):
    """ReceptorEncoderGVP equivalent (receptor_encoder_gvp.py:97-322)."""

    in_scalar_size: int
    n_keypoints: int = 20
    out_scalar_size: int = 128
    vector_size: int = 16
    n_rr_convs: int = 3
    n_rk_convs: int = 2
    n_message_gvps: int = 1
    n_update_gvps: int = 1
    message_norm: Union[float, str] = 10
    use_sameres_feat: bool = False
    kp_rad: float = 0.0
    k_closest: int = 0
    dropout: float = 0.0
    graph_cutoffs: Dict[str, float] = None
    rr_max_neighbors: int = 32  # see encoder_egnn.py note
    rr_layout: str = "nbr"  # exact capped nbr list (see encoder_egnn.py note) | 'block'
    rr_block_size: int = 64
    nbr_gather: str = "onehot"  # one-hot-matmul rr/rk gathers (exact; default); 'take' = dynamic-gather HLO
    compute_dtype: str = "float32"
    # 'executed' replicates the reference's keypoint attention as actually
    # computed: receptor_encoder_gvp.py:71-81 scales/exps LOCAL copies only,
    # so fn.v_mul_e reads the RAW dot — weights raw/sum(exp(raw/sqrt(F))),
    # unnormalized (same lost write as the EGNN encoder; see
    # encoder_egnn.py attn_semantics and tests/test_reference_execution.py).
    attn_semantics: str = "intent"
    # internal vector layout (models/gvp.py flat docs); kp_v is unflattened
    # back to (B, K, V, 3) at the encoder boundary
    vec_layout: str = "flat"

    @nn.compact
    def __call__(self, cpx: PaddedComplex, deterministic: bool = True) -> PaddedComplex:
        if (self.kp_rad != 0) == (self.k_closest != 0):
            raise ValueError("exactly one of kp_rad / k_closest must be non-zero")

        b, nr = cpx.rec_mask.shape
        K = self.n_keypoints
        F = self.out_scalar_size

        x0 = cpx.rec_x
        mask = cpx.rec_mask
        res = cpx.rec_res_idx

        if self.rr_layout == "block":
            # spatially sort the pocket atoms (a set — safe) for banded
            # block-dense rr edges; see BASELINE.md gather ablation
            from kpdiff_tpu.ops.spatial import block_windows, choose_tile, spatial_sort_permutation

            perm = spatial_sort_permutation(x0, mask)
            x0 = jnp.take_along_axis(x0, perm[..., None], axis=1)
            mask = jnp.take_along_axis(mask, perm, axis=1)
            res = jnp.take_along_axis(res, perm, axis=1)
            rec_h_in = jnp.take_along_axis(cpx.rec_h, perm[..., None], axis=1)
        else:
            rec_h_in = cpx.rec_h

        # scalar embedding (receptor_encoder_gvp.py:158-164,218-222)
        h = MLP([F, F], ["silu", "silu"], name="scalar_embed")(rec_h_in)
        h = nn.LayerNorm(epsilon=1e-5, name="scalar_norm")(h)
        h = h * mask[..., None]
        flat = self.vec_layout == "flat"
        v = (jnp.zeros((b, nr, 3 * self.vector_size), h.dtype) if flat
             else jnp.zeros((b, nr, self.vector_size, 3), h.dtype))

        edge_feat = None
        if self.rr_layout == "block":
            tile = choose_tile(x0.shape[1], self.rr_block_size)
            xw = block_windows(x0, tile)
            mw = block_windows(mask, tile)
            b_, nt, w = mw.shape
            xt = x0.reshape(b_, nt, tile, 3)
            mt = mask.reshape(b_, nt, tile)
            d2 = jnp.sum(jnp.square(xw[:, :, :, None, :] - xt[:, :, None, :, :]), axis=-1)
            valid = mw[:, :, :, None] & mt[:, :, None, :]
            eye = jnp.zeros((w, tile), bool).at[jnp.arange(tile) + tile, jnp.arange(tile)].set(True)
            adj = (d2 < float(self.graph_cutoffs["rr"]) ** 2) & valid & ~eye[None, None]
            rr_edges = (adj,)
            n_edges = jnp.sum(adj, axis=(1, 2, 3)).astype(jnp.float32)
            if self.use_sameres_feat:
                rw = block_windows(res, tile)
                rt = res.reshape(b_, nt, tile)
                edge_feat = (rw[:, :, :, None] == rt[:, :, None, :]).astype(h.dtype)[..., None]
        else:
            rr_idx, rr_valid = radius_neighbor_list(
                x0, mask, x0, mask, self.graph_cutoffs["rr"], self.rr_max_neighbors, exclude_self=True
            )
            rr_edges = (rr_idx, rr_valid)
            n_edges = jnp.sum(rr_valid, axis=(1, 2)).astype(jnp.float32)
            if self.use_sameres_feat:
                res_nbr = jnp.take_along_axis(res[:, :, None], rr_idx, axis=1)
                edge_feat = (res_nbr == res[:, :, None]).astype(h.dtype)[..., None]

        # z for rr convs (receptor_encoder_gvp.py:239-249): NO +1
        if self.message_norm == "mean":
            z = 1.0
        elif self.message_norm == 0:
            n_rec = jnp.maximum(jnp.sum(mask, axis=1), 1).astype(jnp.float32)
            z = (n_edges / n_rec)[:, None, None]  # (B,1,1) vs s_msg (B,N,S)
        else:
            z = float(self.message_norm)

        # static_argnums: `deterministic` (idx 7, self=0) is a Python bool
        # branching the dropout path — must not be traced through remat
        RRConv = nn.remat(GVPEdgeConvNbr, static_argnums=(7,))
        for i in range(self.n_rr_convs):
            h, v = RRConv(
                scalar_size=F,
                vector_size=self.vector_size,
                n_message_gvps=self.n_message_gvps,
                n_update_gvps=self.n_update_gvps,
                edge_feat_size=1 if self.use_sameres_feat else 0,
                rbf_dmax=self.graph_cutoffs["rr"],
                message_norm=self.message_norm,
                dropout=self.dropout,
                dtype=self.compute_dtype,
                layout=self.rr_layout,
                vec_layout=self.vec_layout,
                gather_mode=self.nbr_gather,
                name=f"rr_conv{i}",
            )((h, x0, v), (h, x0, v), rr_edges, jnp.asarray(z, jnp.float32), mask, edge_feat,
              deterministic)

        # ---- keypoint initializer (receptor_encoder_gvp.py:15-93)
        mean_feat = masked_mean(h, mask, axis=1)
        kp_emb = nn.silu(TorchLinear(F * K, name="keypoint_embedding")(mean_feat))
        kp_emb = nn.LayerNorm(epsilon=1e-5, name="keypoint_embedding_norm")(kp_emb)
        kp_emb = kp_emb.reshape(b, K, F)

        ft_rec = TorchLinear(F, use_bias=False, name="src_net")(h)
        ft_kp = TorchLinear(F, use_bias=False, name="dst_net")(kp_emb)
        raw = jnp.einsum("bkf,brf->bkr", ft_kp, ft_rec)
        logits = jnp.where(mask[:, None, :], raw / jnp.sqrt(float(F)), _NEG)
        if self.attn_semantics == "executed":
            # the reference's lost exp/scale (see field docs)
            denom = jnp.sum(jnp.exp(logits), axis=-1, keepdims=True)
            attn = jnp.where(mask[:, None, :], raw, 0.0) / denom
        else:
            attn = nn.softmax(logits, axis=-1)
        kp_pos = jnp.einsum("bkr,brc->bkc", attn, x0)

        kp_h = jnp.zeros((b, K, F), h.dtype)
        kp_v = (jnp.zeros((b, K, 3 * self.vector_size), h.dtype) if flat
                else jnp.zeros((b, K, self.vector_size, 3), h.dtype))
        kp_mask = jnp.ones((b, K), bool)

        # ---- rk edges (receptor_encoder_gvp.py:297-322)
        if self.k_closest > 0:
            rk_idx, rk_dist, rk_valid = knn_indices(x0, mask, kp_pos, kp_mask, self.k_closest)
        else:
            rk_idx, rk_valid = radius_neighbor_list(x0, mask, kp_pos, kp_mask, self.kp_rad, 10)

        # z for rk convs (receptor_encoder_gvp.py:266-269): NO +1
        if self.message_norm == 0:
            n_edges = jnp.sum(rk_valid, axis=(1, 2)).astype(jnp.float32)
            z_rk = (n_edges / K)[:, None, None]  # (B,1,1) vs s_msg (B,K,S)
        elif self.message_norm == "mean":
            z_rk = 1.0
        else:
            z_rk = float(self.message_norm)

        for i in range(self.n_rk_convs):
            kp_h, kp_v = GVPEdgeConvNbr(
                scalar_size=F,
                vector_size=self.vector_size,
                n_message_gvps=self.n_message_gvps,
                n_update_gvps=self.n_update_gvps,
                use_dst_feats=i != 0,
                rbf_dmax=self.graph_cutoffs["rk"],
                message_norm=self.message_norm,
                dropout=self.dropout,
                vec_layout=self.vec_layout,
                gather_mode=self.nbr_gather,
                name=f"rk_conv{i}",
            )((h, x0, v), (kp_h, kp_pos, kp_v), (rk_idx, rk_valid), z_rk, kp_mask, None, deterministic)

        if flat:
            kp_v = unflatten_vec(kp_v)
        return cpx.replace(kp_x=kp_pos, kp_h=kp_h, kp_mask=kp_mask, kp_v=kp_v)

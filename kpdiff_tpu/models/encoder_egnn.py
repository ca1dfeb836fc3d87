"""Learned EGNN receptor encoder: pocket atoms -> k equivariant keypoints.

TPU re-design of the reference ReceptorEncoder / ReceptorConv / RecKeyConv
(models/receptor_encoder.py:14-555). The rec->kp attention becomes a dense
masked softmax over (B, K, Nr) — replacing the reference's manual
segment_csr softmax (receptor_encoder.py:198-217) — and rr message passing
runs over a destination-major neighbor list.

Executed-behavior parity notes:
  * RecKeyConv uses fc_src for BOTH queries and keys (fc_dst is created but
    unused — receptor_encoder.py:190-191). Replicated; documented here so
    the weight exists for checkpoint-shape parity but is not applied.
  * the encoder's z normalization (message_norm==0) is edges/nodes WITHOUT
    the +1 the dynamics adds (receptor_encoder.py:503-504 vs dynamics.py:283).
  * the encoder node update is NOT residual: h = phi_h(cat(h, agg))
    (receptor_encoder.py:149), unlike the dynamics' residual update.
  * k_closest keypoint features use the ORIGINAL rec positions x_0 for the
    knn (receptor_encoder.py:273) even when fix_pos=False let coords move,
    and the attention values use the MOVED coords ('x') in that case
    (receptor_encoder.py:213-217).
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from kpdiff_tpu.models.complex import PaddedComplex
from kpdiff_tpu.models.egnn import EGNNEdgeNbrList
from kpdiff_tpu.models.nn import MLP, TorchLinear
from kpdiff_tpu.ops.geometry import masked_mean
from kpdiff_tpu.ops.neighbors import knn_indices, radius_neighbor_list

_NEG = -1e30


class ReceptorConvLayer(nn.Module):
    """One EGNN conv over rr edges (receptor_encoder.py:14-154).

    rr edges come either as a destination-major neighbor list
    (layout='nbr': idx, valid) or banded block-dense windows
    (layout='block': adj) — the two edge modules share one parameter
    scheme, so the layout is a construction choice, not a checkpoint
    format."""

    hidden_size: int
    out_size: int
    use_tanh: bool = True
    coords_range: float = 10.0
    fix_pos: bool = False
    norm: bool = False
    edge_feat_size: int = 0
    dtype: str = "float32"
    layout: str = "nbr"
    gather_mode: str = "take"  # 'onehot': nbr gathers as one-hot matmuls (exact)

    @nn.compact
    def __call__(self, h, x, mask, rr_edges, z, edge_feat=None):
        common = dict(
            hidden_size=self.hidden_size,
            use_tanh=self.use_tanh,
            coords_range=self.coords_range,
            coord_hidden_layers=1,  # encoder coord MLP has ONE hidden layer (receptor_encoder.py:63-67)
            compute_coord=not self.fix_pos,
            edge_feat_size=self.edge_feat_size,
            dtype=self.dtype,
            name="edge_rr",
        )
        if self.layout == "block":
            from kpdiff_tpu.models.egnn import EGNNEdgeDense
            from kpdiff_tpu.ops.spatial import block_windows

            (adj,) = rr_edges  # (B, nt, 3T, T); edge_feat (B, nt, 3T, T, E)
            b, nt, w, tile = adj.shape
            N, F = h.shape[1], h.shape[-1]
            hw = block_windows(h, tile).reshape(b * nt, w, F)
            xw = block_windows(x, tile).reshape(b * nt, w, 3)
            ef = None if edge_feat is None else edge_feat.reshape(b * nt, w, tile, -1)
            agg_h, agg_x = EGNNEdgeDense(**common)(
                hw, h.reshape(b * nt, tile, F), xw, x.reshape(b * nt, tile, 3),
                adj.reshape(b * nt, w, tile), ef,
            )
            agg_h = agg_h.reshape(b, N, -1)
            agg_x = agg_x.reshape(b, N, 3)
        else:
            nbr_idx, nbr_valid = rr_edges
            agg_h, agg_x = EGNNEdgeNbrList(gather_mode=self.gather_mode, **common)(
                h, h, x, x, nbr_idx, nbr_valid, edge_feat)

        h_neigh = agg_h / z
        x_neigh = agg_x / z

        new_h = MLP([self.hidden_size, self.out_size], ["silu", ""], name="node_mlp")(
            jnp.concatenate([h, h_neigh], axis=-1)
        )
        if self.norm:
            new_h = nn.LayerNorm(epsilon=1e-5)(new_h)
        m = mask[..., None].astype(new_h.dtype)
        return new_h * m, (x + x_neigh) * m


class EGNNReceptorEncoder(nn.Module):
    """ReceptorEncoder equivalent (receptor_encoder.py:381-555)."""

    n_keypoints: int = 20
    in_n_node_feat: int = 13
    hidden_n_node_feat: int = 256
    out_n_node_feat: int = 256
    n_convs: int = 6
    use_tanh: bool = True
    coords_range: float = 10.0
    kp_feat_scale: float = 1.0  # kept for config parity (unused, as in reference)
    message_norm: float = 1.0
    kp_rad: float = 0.0
    k_closest: int = 0
    norm: bool = False
    fix_pos: bool = False
    use_sameres_feat: bool = False
    n_kk_convs: int = 0  # reference KeyKeyConv raises NotImplementedError (receptor_encoder.py:337)
    n_kk_heads: int = 4
    graph_cutoffs: Dict[str, float] = None
    # reference data-prep caps rr at 100 (pdbbind_processing.py:246) which
    # is effectively uncapped; 32 >= the max protein-density degree at the
    # 3.5 A cutoff (~22), so the nearest-32 list is the same exact edge set
    # at 3x less gather volume (BASELINE.md round-2 sweep)
    rr_max_neighbors: int = 32
    # 'nbr' = capped nearest-neighbor list: EXACT radius graph whenever the
    # cap >= max degree (protein-density pockets max ~22 at 3.5 A), and
    # measured FASTER than the banded block layout at cap 32 (BASELINE.md
    # round-2). 'block' (banded, ~90% recall on protein density) kept as an
    # option for very large sets.
    rr_layout: str = "nbr"
    rr_block_size: int = 64
    nbr_gather: str = "onehot"  # one-hot-matmul rr gathers (exact; default); 'take' = dynamic-gather HLO
    compute_dtype: str = "float32"  # 'bfloat16' for mixed-precision edge MLPs
    # Keypoint attention semantics. 'intent' (default) is a true softmax.
    # 'executed' replicates what the reference actually computes: at
    # receptor_encoder.py:201-210 the scaling and exp are applied to LOCAL
    # variables only, so fn.v_mul_e reads the RAW edge dot product — the
    # executed weights are raw_dot / sum_r exp(raw_dot/sqrt(F)): not
    # normalized, can be negative (tests/test_reference_execution.py).
    # Use 'executed' when importing shipped learned-encoder checkpoints.
    attn_semantics: str = "intent"

    @nn.compact
    def __call__(self, cpx: PaddedComplex) -> PaddedComplex:
        if (self.kp_rad != 0) == (self.k_closest != 0):
            raise ValueError("exactly one of kp_rad / k_closest must be non-zero")
        if self.n_kk_convs > 0:
            raise NotImplementedError("KeyKeyConv is unfinished in the reference (receptor_encoder.py:337)")

        b, nr = cpx.rec_mask.shape
        K = self.n_keypoints
        F = self.out_n_node_feat

        x0 = cpx.rec_x
        h = cpx.rec_h
        mask = cpx.rec_mask
        res = cpx.rec_res_idx

        # rr edge structure (built at data-prep time in the reference,
        # pdbbind_processing.py:246; rebuilt here on device at encode time).
        # 'block': spatially sort the pocket atoms (a set — safe) and use
        # banded dense windows: TPU dynamic gathers are far slower than the
        # extra dense FLOPs (see BASELINE.md all-atom ablation).
        if self.rr_layout == "block":
            from kpdiff_tpu.ops.spatial import block_windows, choose_tile, spatial_sort_permutation

            perm = spatial_sort_permutation(x0, mask)
            x0 = jnp.take_along_axis(x0, perm[..., None], axis=1)
            h = jnp.take_along_axis(h, perm[..., None], axis=1)
            mask = jnp.take_along_axis(mask, perm, axis=1)
            res = jnp.take_along_axis(res, perm, axis=1)

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
            edge_feat = None
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
            edge_feat = None
            if self.use_sameres_feat:
                res_nbr = jnp.take_along_axis(res[:, :, None], rr_idx, axis=1)
                edge_feat = (res_nbr == res[:, :, None]).astype(h.dtype)[..., None]  # (B,Nr,K,1)

        # z normalization WITHOUT +1 (receptor_encoder.py:501-506)
        if self.message_norm == 0:
            n_rec = jnp.maximum(jnp.sum(mask, axis=1), 1).astype(jnp.float32)
            z = (n_edges / n_rec)[:, None, None]
        else:
            z = float(self.message_norm)

        x = x0
        # remat each conv: the per-pair activations are recomputed in the
        # backward pass instead of being stashed (they dominate HBM at
        # pocket scale: (B*nt, 3T, T, H) per matmul per conv)
        ConvLayer = nn.remat(ReceptorConvLayer, static_argnums=())
        for i in range(self.n_convs):
            last = i == self.n_convs - 1
            out_size = self.out_n_node_feat if (last or self.n_convs == 1) else self.hidden_n_node_feat
            h, x = ConvLayer(
                hidden_size=self.hidden_n_node_feat,
                out_size=out_size,
                use_tanh=self.use_tanh,
                coords_range=self.coords_range,
                fix_pos=self.fix_pos,
                norm=self.norm,
                edge_feat_size=1 if self.use_sameres_feat else 0,
                dtype=self.compute_dtype,
                layout=self.rr_layout,
                gather_mode=self.nbr_gather,
                name=f"rec_conv{i}",
            )(h, x, mask, rr_edges, jnp.asarray(z, jnp.float32), edge_feat)

        # ---- keypoint init: mean pocket feature -> K embeddings
        # (receptor_encoder.py:461-466,523-527)
        mean_feat = masked_mean(h, mask, axis=1)  # (B, F)
        kp_emb = nn.silu(TorchLinear(F * K, name="keypoint_embedding")(mean_feat))
        kp_h = kp_emb.reshape(b, K, F)

        # ---- RecKeyConv attention positioning (receptor_encoder.py:182-236)
        fc_src = TorchLinear(F, use_bias=False, name="rk_fc_src")
        # fc_dst exists in the reference but is never used (fc_src computes
        # both queries and keys); create it for parameter parity
        _ = TorchLinear(F, use_bias=False, name="rk_fc_dst")(kp_h)
        ft_rec = fc_src(h)  # (B, Nr, F)
        ft_kp = fc_src(kp_h)  # (B, K, F)

        raw = jnp.einsum("bkf,brf->bkr", ft_kp, ft_rec)  # (B, K, Nr)
        logits = jnp.where(mask[:, None, :], raw / jnp.sqrt(float(F)), _NEG)
        if self.attn_semantics == "executed":
            # the reference's lost exp/scale: numerator is the raw dot,
            # denominator the masked sum of exp(raw/sqrt(F)) (see field docs)
            denom = jnp.sum(jnp.exp(logits), axis=-1, keepdims=True)
            attn = jnp.where(mask[:, None, :], raw, 0.0) / denom
        else:
            attn = nn.softmax(logits, axis=-1)  # (B, K, Nr)

        val = x0 if self.fix_pos else x  # receptor_encoder.py:213-217
        kp_pos = jnp.einsum("bkr,brc->bkc", attn, val)

        # ---- keypoint features
        if self.k_closest:
            kp_feat_in = self._k_closest_feats(h, x0, mask, kp_pos)
        else:
            kp_feat_in = self._kp_rad_feats(h, x0, mask, kp_pos)

        kp_feat = nn.silu(TorchLinear(F, name="kp_feature_mlp")(kp_feat_in))
        if self.norm:
            kp_feat = nn.LayerNorm(epsilon=1e-5, name="kp_feature_norm")(kp_feat)

        kp_mask = jnp.ones((b, K), bool)
        return cpx.replace(kp_x=kp_pos, kp_h=kp_feat, kp_mask=kp_mask, kp_v=None)

    def _k_closest_feats(self, h, x0, mask, kp_pos):
        """mean rec feature over the k closest rec atoms + the k sorted
        distances as extra channels (receptor_encoder.py:266-297)."""
        b, K = kp_pos.shape[:2]
        kp_mask = jnp.ones((b, K), bool)
        idx, dist, valid = knn_indices(x0, mask, kp_pos, kp_mask, self.k_closest)
        h_nbr = jnp.take_along_axis(h[:, :, None, :], idx[..., None], axis=1)  # (B,K,k,F)
        vf = valid[..., None].astype(h.dtype)
        h_mean = jnp.sum(h_nbr * vf, axis=2) / jnp.maximum(jnp.sum(vf, axis=2), 1.0)
        return jnp.concatenate([h_mean, dist * valid], axis=-1)

    def _kp_rad_feats(self, h, x0, mask, kp_pos):
        """sum of rec features within kp_rad, normalized by avg degree + 1
        (receptor_encoder.py:238-264)."""
        b, K = kp_pos.shape[:2]
        kp_mask = jnp.ones((b, K), bool)
        idx, within = radius_neighbor_list(x0, mask, kp_pos, kp_mask, self.kp_rad, 100)
        h_nbr = jnp.take_along_axis(h[:, :, None, :], idx[..., None], axis=1)
        wf = within[..., None].astype(h.dtype)
        h_sum = jnp.sum(h_nbr * wf, axis=2)  # (B,K,F)
        n_edges = jnp.sum(within, axis=(1, 2)).astype(jnp.float32)
        z = (n_edges / K + 1.0)[:, None, None]
        return h_sum / z

"""GVP noise-prediction dynamics — TPU re-design of the reference
LigRecDynamicsGVP / LigRecGVP / GVPMultiEdgeConv stack
(models/dynamics_gvp.py:10-256, models/gvp.py:343-550).

Differences from the EGNN dynamics worth noting:
  * the timestep is appended BEFORE the scalar encoders (dynamics_gvp.py:
    124-134,160-169), and positions never move — noise vectors come from a
    dedicated NoisePredictionBlock (dynamics_gvp.py:10-44);
  * with update_kp=True, the LAST conv layer drops the lk/kk edge types
    (dynamics_gvp.py:67-74);
  * message_norm semantics (gvp.py:374-389,501-517): 'mean' -> mean
    aggregation (norm value 1), 0 -> per-graph average in-degree + 1,
    const -> sum aggregation divided by const.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from kpdiff_tpu.models.gvp import (
    GVP,
    GVPChain,
    GVPEdgeMessagesDense,
    GVPEdgeMessagesKNNPairs,
    GVPEdgeMessagesNbr,
    GVPLayerNorm,
    _update_specs,
    flatten_vec,
    gvp_dropout,
)
from kpdiff_tpu.models.nn import TorchLinear
from kpdiff_tpu.ops.neighbors import dense_knn_adjacency, dense_radius_adjacency, knn_indices


class PairList(NamedTuple):
    """kNN pair-list adjacency for kl/lk: (B, K, k) ligand indices + valid
    mask. A NamedTuple so the tag is the pytree TYPE rather than a string
    leaf — strings are not JAX types and would break tracing the adjacency
    dict through jax.checkpoint (the `remat` flag)."""

    idx: jnp.ndarray
    valid: jnp.ndarray


class GVPMultiEdgeConvDense(nn.Module):
    """One conv over multiple edge types with per-dst-ntype updates
    (gvp.py:343-550). Dense pair-grid edges."""

    etypes: Tuple[Tuple[str, str, str], ...]
    scalar_size: int
    vector_size: int
    n_message_gvps: int = 3
    n_update_gvps: int = 2
    message_norm: Union[float, str] = 10
    dropout: float = 0.0
    rbf_dmax: float = 15.0
    rbf_dim: int = 16
    dtype: str = "float32"
    vec_layout: str = "vc"  # 'flat': node vectors are (..., 3V) v-major
    gather_mode: str = "take"  # nbr/pair-list gathers: 'take' | 'onehot' (exact)

    @nn.compact
    def __call__(self, node_data, adj, masks, deterministic: bool = True):
        flat = self.vec_layout == "flat"
        # node_data: ntype -> (scalars, pos, vectors); adj: 'll','kl','lk','kk'
        dst_ntypes = sorted({e[2] for e in self.etypes})
        agg = "mean" if self.message_norm == "mean" else "sum"

        agg_s = {n: 0.0 for n in dst_ntypes}
        agg_v = {n: 0.0 for n in dst_ntypes}
        for etype in self.etypes:
            src, ename, dst = etype
            h_s, x_s, v_s = node_data[src]
            h_d, x_d, v_d = node_data[dst]
            common = dict(
                scalar_size=self.scalar_size,
                vector_size=self.vector_size,
                n_message_gvps=self.n_message_gvps,
                rbf_dmax=self.rbf_dmax,
                rbf_dim=self.rbf_dim,
                agg=agg,
                dtype=self.dtype,
                vec_layout=self.vec_layout,
                name=f"message_{ename}",
            )
            if isinstance(adj[ename], PairList):
                # kNN pair list shared by kl (anchor kp = src) and lk
                # (anchor kp = dst): true K*kl_k edges instead of dense grids
                idx, valid = adj[ename]
                h_a, x_a, v_a = node_data["kp"]
                h_o, x_o, v_o = node_data["lig"]
                ds, dv = GVPEdgeMessagesKNNPairs(
                    anchor_is_src=(src == "kp"), gather_mode=self.gather_mode, **common,
                )(h_a, v_a, x_a, h_o, v_o, x_o, idx, valid)
            elif isinstance(adj[ename], dict):
                # banded block-dense windows over spatially sorted keypoints
                from kpdiff_tpu.ops.spatial import block_windows

                blk = adj[ename]["block"]
                b, nt, w, tile = blk.shape
                K = nt * tile
                S_ = h_s.shape[-1]
                hw = block_windows(h_s, tile).reshape(b * nt, w, S_)
                xw = block_windows(x_s, tile).reshape(b * nt, w, 3)
                ht = h_d.reshape(b * nt, tile, S_)
                xt = x_d.reshape(b * nt, tile, 3)
                if flat:
                    V3 = v_s.shape[-1]
                    vw = block_windows(v_s, tile).reshape(b * nt, w, V3)
                    vt = v_d.reshape(b * nt, tile, V3)
                else:
                    V_ = v_s.shape[-2]
                    vw = block_windows(v_s, tile).reshape(b * nt, w, V_, 3)
                    vt = v_d.reshape(b * nt, tile, V_, 3)
                ds, dv = GVPEdgeMessagesDense(**common)(hw, vw, xw, ht, vt, xt, blk.reshape(b * nt, w, tile))
                ds = ds.reshape(b, K, S_)
                dv = dv.reshape(b, K, V3) if flat else dv.reshape(b, K, V_, 3)
            elif isinstance(adj[ename], tuple):
                # destination-major neighbor list (all-atom kk at pocket scale)
                idx, valid = adj[ename]
                ds, dv = GVPEdgeMessagesNbr(gather_mode=self.gather_mode, **common)(
                    h_s, v_s, x_s, h_d, v_d, x_d, idx, valid)
            else:
                ds, dv = GVPEdgeMessagesDense(**common)(h_s, v_s, x_s, h_d, v_d, x_d, adj[ename])
            agg_s[dst] = agg_s[dst] + ds
            agg_v[dst] = agg_v[dst] + dv

        out = dict(node_data)
        for ntype in dst_ntypes:
            h, x, v = node_data[ntype]
            if self.message_norm == "mean":
                norm = 1.0
            elif self.message_norm == 0:
                n_nodes = jnp.maximum(jnp.sum(masks[ntype], axis=1), 1).astype(jnp.float32)
                n_edges = 0.0
                for etype in self.etypes:
                    if etype[2] == ntype:
                        a = adj[etype[1]]
                        if isinstance(a, dict):
                            n_edges = n_edges + jnp.sum(a["block"], axis=(1, 2, 3)).astype(jnp.float32)
                        elif isinstance(a, PairList):
                            n_edges = n_edges + jnp.sum(a.valid, axis=(1, 2)).astype(jnp.float32)
                        else:
                            a = a[1] if isinstance(a, tuple) else a
                            n_edges = n_edges + jnp.sum(a, axis=(1, 2)).astype(jnp.float32)
                norm = (n_edges / n_nodes + 1.0)[:, None, None]
            else:
                norm = float(self.message_norm)

            s_msg = agg_s[ntype] / norm
            if flat:
                v_msg = agg_v[ntype] / norm
            else:
                v_msg = agg_v[ntype] / (norm if isinstance(norm, float) else norm[..., None])

            if self.dropout > 0 and not deterministic:
                key = self.make_rng("dropout")
                s_msg, v_msg = gvp_dropout(key, s_msg, v_msg, self.dropout, deterministic,
                                           vec_layout=self.vec_layout)

            h = h + s_msg
            v = v + v_msg
            h, v = GVPLayerNorm(vec_layout=self.vec_layout, name=f"msg_norm_{ntype}")(h, v)

            s_res, v_res = GVPChain(
                _update_specs(self.scalar_size, self.vector_size, self.n_update_gvps),
                dtype=self.dtype,
                vec_layout=self.vec_layout,
                name=f"update_{ntype}",
            )((h, v))
            s_res = s_res.astype(h.dtype)
            v_res = v_res.astype(v.dtype)
            if self.dropout > 0 and not deterministic:
                key = self.make_rng("dropout")
                s_res, v_res = gvp_dropout(key, s_res, v_res, self.dropout, deterministic,
                                           vec_layout=self.vec_layout)
            h = h + s_res
            v = v + v_res
            h, v = GVPLayerNorm(vec_layout=self.vec_layout, name=f"upd_norm_{ntype}")(h, v)

            m = masks[ntype][..., None].astype(h.dtype)
            out[ntype] = (h * m, x, (v * m) if flat else (v * m[..., None]))
        return out


class NoisePredictionBlock(nn.Module):
    """GVP chain -> (scalar noise, single vector noise) (dynamics_gvp.py:10-44)."""

    in_scalar_dim: int
    out_scalar_dim: int
    vector_size: int
    n_gvps: int = 3
    intermediate_scalar_dim: int = 64
    vec_layout: str = "vc"

    @nn.compact
    def __call__(self, scalars, vectors):
        data = (scalars, vectors)
        for i in range(self.n_gvps):
            last = i == self.n_gvps - 1
            data = GVP(
                dim_vectors_in=self.vector_size,
                dim_vectors_out=1 if last else self.vector_size,
                dim_feats_in=self.in_scalar_dim,
                dim_feats_out=self.intermediate_scalar_dim if last else self.in_scalar_dim,
                vectors_activation="identity" if last else "sigmoid",
                vec_layout=self.vec_layout,
                name=f"gvp{i}",
            )(data)
        s, v = data
        s = TorchLinear(self.out_scalar_dim, name="to_scalar_output")(s)
        # single vector channel: flat layout is already (..., 3)
        return s, (v if self.vec_layout == "flat" else v[..., 0, :])


class GVPDynamics(nn.Module):
    """LigRecDynamicsGVP equivalent (dynamics_gvp.py:104-256)."""

    n_lig_scalars: int
    n_kp_scalars: int
    vector_size: int = 16
    n_convs: int = 4
    n_hidden_scalars: int = 128
    message_norm: Union[float, str] = 1
    update_kp: bool = False
    ll_k: int = 0
    kl_k: int = 0
    ll_cutoff: float = 9.0
    kl_cutoff: float = 8.0
    n_message_gvps: int = 3
    n_update_gvps: int = 2
    n_noise_gvps: int = 3
    dropout: float = 0.0
    compute_dtype: str = "float32"
    kk_layout: str = "dense"  # 'dense' | 'nbr' | 'block' (all-atom pocket-scale keypoints)
    kk_block_size: int = 64   # tile size for the 'block' layout
    nbr_gather: str = "onehot"  # one-hot-matmul gathers (exact; default — measured 1.7-1.9x on nbr variants); 'take' = dynamic-gather HLO
    # internal vector layout: 'flat' stores vectors (..., 3V) v-major so
    # elementwise/pair work is lane-efficient on TPU (a (..., V, 3) tensor
    # tiles at ~2% utilization); numerics identical (tests/test_gvp_flat.py)
    vec_layout: str = "flat"
    # Rematerialize each multi-edge conv in the backward pass
    # (jax.checkpoint; `deterministic` stays static for the dropout branch).
    # Cuts the training-step HBM peak from n_convs stored pair-tensor sets
    # to one, at ~1 extra forward of compute — exact math. Needed for the
    # ca/all-atom configs (dense kk over up to n_rec keypoints) on a 16G
    # chip at reference batch sizes.
    remat: bool = False

    NO_KP_EDGES = (("lig", "ll", "lig"), ("kp", "kl", "lig"))
    KP_EDGES = NO_KP_EDGES + (("lig", "lk", "kp"), ("kp", "kk", "kp"))

    @nn.compact
    def __call__(
        self,
        lig_x, lig_h, lig_mask, kp_x, kp_h, kp_mask, t, kk_edges, kp_v=None,
        deterministic: bool = True,
    ):
        b, nl = lig_mask.shape
        k = kp_mask.shape[1]
        H = self.n_hidden_scalars

        # append t, then encode scalars (dynamics_gvp.py:156-169)
        t_lig = jnp.broadcast_to(t[:, None, None], (b, nl, 1)).astype(lig_h.dtype)
        t_kp = jnp.broadcast_to(t[:, None, None], (b, k, 1)).astype(kp_h.dtype)
        lig_s = jnp.concatenate([lig_h, t_lig], axis=-1)
        kp_s = jnp.concatenate([kp_h, t_kp], axis=-1)

        lig_s = nn.LayerNorm(epsilon=1e-5)(nn.silu(TorchLinear(H, name="lig_enc")(lig_s)))
        kp_s = nn.LayerNorm(epsilon=1e-5)(nn.silu(TorchLinear(H, name="kp_enc")(kp_s)))
        lig_s = lig_s * lig_mask[..., None]
        kp_s = kp_s * kp_mask[..., None]

        flat = self.vec_layout == "flat"
        if flat:
            lig_v = jnp.zeros((b, nl, 3 * self.vector_size), lig_s.dtype)
            kp_v = (jnp.zeros((b, k, 3 * self.vector_size), kp_s.dtype)
                    if kp_v is None else flatten_vec(kp_v))
        else:
            lig_v = jnp.zeros((b, nl, self.vector_size, 3), lig_s.dtype)
            if kp_v is None:
                kp_v = jnp.zeros((b, k, self.vector_size, 3), kp_s.dtype)

        # ligand edges rebuilt from current positions (dynamics_gvp.py:201-234)
        if self.ll_k > 0:
            ll = dense_knn_adjacency(lig_x, lig_mask, lig_x, lig_mask, self.ll_k, per="dst", exclude_self=True)
        else:
            ll = dense_radius_adjacency(lig_x, lig_mask, lig_x, lig_mask, self.ll_cutoff, exclude_self=True)
        if self.kl_k > 0:
            # true K*kl_k pair list (each kp's kl_k nearest ligand atoms —
            # same edge set as the reference's knn, dynamics_gvp.py:201-234)
            kl_idx, _kl_dist, kl_valid = knn_indices(lig_x, lig_mask, kp_x, kp_mask, self.kl_k)
            kl_valid = kl_valid & kp_mask[:, :, None]
            kl = PairList(kl_idx, kl_valid)
        else:
            kl = dense_radius_adjacency(kp_x, kp_mask, lig_x, lig_mask, self.kl_cutoff)
        adj = {"ll": ll, "kl": kl}
        if self.update_kp:
            adj["lk"] = kl if isinstance(kl, tuple) else jnp.swapaxes(kl, 1, 2)
            if kk_edges is None:
                raise ValueError("kk_edges required when update_kp=True")
            adj["kk"] = kk_edges

        node_data = {"lig": (lig_s, lig_x, lig_v), "kp": (kp_s, kp_x, kp_v)}
        masks = {"lig": lig_mask, "kp": kp_mask}

        # static_argnums: `deterministic` (idx 4, self=0) is a Python bool
        # branching the dropout path — must not be traced through remat
        Conv = (nn.remat(GVPMultiEdgeConvDense, static_argnums=(4,))
                if self.remat else GVPMultiEdgeConvDense)
        for i in range(self.n_convs):
            if not self.update_kp or i == self.n_convs - 1:
                etypes = self.NO_KP_EDGES  # last layer drops kp updates (dynamics_gvp.py:69-74)
            else:
                etypes = self.KP_EDGES
            node_data = Conv(
                etypes=etypes,
                scalar_size=H,
                vector_size=self.vector_size,
                n_message_gvps=self.n_message_gvps,
                n_update_gvps=self.n_update_gvps,
                message_norm=self.message_norm,
                dropout=self.dropout,
                dtype=self.compute_dtype,
                vec_layout=self.vec_layout,
                gather_mode=self.nbr_gather,
                name=f"conv{i}",
            )(node_data, adj, masks, deterministic)

        lig_s, _, lig_v = node_data["lig"]
        eps_h, eps_x = NoisePredictionBlock(
            in_scalar_dim=H,
            out_scalar_dim=self.n_lig_scalars,
            vector_size=self.vector_size,
            n_gvps=self.n_noise_gvps,
            vec_layout=self.vec_layout,
            name="noise_predictor",
        )(lig_s, lig_v)

        m = lig_mask[..., None]
        return eps_h * m, eps_x * m

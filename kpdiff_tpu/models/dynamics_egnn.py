"""EGNN noise-prediction dynamics — TPU re-design of the reference
LigRecDynamics / LigRecEGNN / LigRecConv stack (models/dynamics.py:221-441).

Differences from the reference that are *layout*, not math:
  * ligand-ligand and keypoint-ligand edges are dense masked pair grids
    rebuilt every call from current positions (the reference rebuilds DGL
    edge lists with torch_cluster each call, dynamics.py:387-420);
  * keypoint-keypoint edges are built ONCE by the encoder and passed in
    (the reference stores them in the graph; they are identical every step);
  * the timestep is appended as a feature channel exactly as the reference
    does (hidden size becomes hidden_nf+1, dynamics.py:336-339,359-363).

Executed-behavior parity: coordinate messages flow on ALL edge types,
including kk and lk, because the reference's zeroing branch is dead code
(dynamics.py:115-116) — so keypoint positions drift within a forward pass
when update_kp_feat=True. Replicated deliberately; see models/egnn.py.
"""
from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from kpdiff_tpu.models.egnn import EGNNEdgeDense, EGNNEdgeKNNPairs, EGNNEdgeNbrList, NodeUpdate
from kpdiff_tpu.models.nn import MLP
from kpdiff_tpu.ops.neighbors import dense_knn_adjacency, dense_radius_adjacency, knn_indices


def precast_pair_params(dyn_params, dtype) -> Dict:
    """Cast the conv layers' pair-MLP weights to the compute dtype ONCE.

    Every parameter of the edge modules (EGNNEdge*) and of NodeUpdate's
    node_mlp is consumed exclusively through `.astype(compute_dtype)` at its
    use site, so feeding them pre-cast is bitwise identical — but under the
    sampling lax.scan those casts re-execute EVERY step: the flagship's
    compiled step carries ~282 convert/copy instructions of 257x257 weights
    (~74 MB/step of HBM writes, benchmarks/hlo_bytes.py). model.sample calls
    this outside the scan so the converts trace once. LayerNorm parameters
    stay f32 (LayerNorm computes in f32). Training never uses this — grads
    need the f32 masters.
    """
    dtype = jnp.dtype(dtype)
    if dtype == jnp.float32:
        return dyn_params

    def cast_tree(t):
        return jax.tree_util.tree_map(
            lambda v: v.astype(dtype) if v.dtype == jnp.float32 else v, t)

    out = {}
    for k, v in dyn_params.items():
        if not (isinstance(v, dict) and k.startswith("conv")):
            out[k] = v
            continue
        layer = {}
        for mk, mv in v.items():
            if mk.startswith("edge_"):
                layer[mk] = cast_tree(mv)
            elif mk.startswith("update_") and isinstance(mv, dict):
                layer[mk] = {uk: (cast_tree(uv) if uk == "node_mlp" else uv)
                             for uk, uv in mv.items()}
            else:
                layer[mk] = mv
        out[k] = layer
    return out


class EGNNConvLayer(nn.Module):
    """One heterograph EGNN layer over {ll, kl} (+ {lk, kk} when
    update_kp_feat). Mirrors LigRecConv (dynamics.py:9-217)."""

    hidden_size: int
    use_tanh: bool
    update_kp_feat: bool
    norm: bool
    kk_layout: str = "dense"  # 'dense' | 'nbr'
    dtype: str = "float32"  # compute dtype for the pair MLPs
    use_pallas: bool = False  # fused VMEM edge kernel (forward-only)
    split_last: bool = False  # MXU-aligned t-channel (models/egnn.py _smatmul)
    gather_mode: str = "take"  # nbr/pair-list gathers: 'take' | 'onehot' (exact)

    @nn.compact
    def __call__(self, h, x, edges, z, masks):
        # h/x: dicts with 'lig', 'kp' -> (B, N, F)/(B, N, 3)
        # edges: dict 'll','kl' dense adj; 'lk' dense adj; 'kk' dense adj or (idx, valid)
        # z: dict ntype -> scalar or (B,1,1) message normalizer
        agg_h = {"lig": 0.0, "kp": 0.0}
        agg_x = {"lig": 0.0, "kp": 0.0}

        def dense(name, src, dst, adj):
            mod = EGNNEdgeDense(
                hidden_size=self.hidden_size,
                use_tanh=self.use_tanh,
                coords_range=10.0,
                coord_hidden_layers=2,
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                split_last=self.split_last,
                name=f"edge_{name}",
            )
            dh, dx = mod(h[src], h[dst], x[src], x[dst], adj)
            agg_h[dst] = agg_h[dst] + dh
            agg_x[dst] = agg_x[dst] + dx

        dense("ll", "lig", "lig", edges["ll"])

        if "kl_pairs" in edges:
            # knn kl/lk on the true K*kl_k edge list (10x fewer pair slots
            # than the dense grid; identical edges and math)
            idx, valid = edges["kl_pairs"]
            dh, dx = EGNNEdgeKNNPairs(
                hidden_size=self.hidden_size, anchor_is_src=True,
                use_tanh=self.use_tanh, dtype=self.dtype,
                split_last=self.split_last, gather_mode=self.gather_mode,
                name="edge_kl",
            )(h["kp"], h["lig"], x["kp"], x["lig"], idx, valid)
            agg_h["lig"] = agg_h["lig"] + dh
            agg_x["lig"] = agg_x["lig"] + dx
        else:
            dense("kl", "kp", "lig", edges["kl"])

        if self.update_kp_feat:
            if "kl_pairs" in edges:
                idx, valid = edges["kl_pairs"]
                dh, dx = EGNNEdgeKNNPairs(
                    hidden_size=self.hidden_size, anchor_is_src=False,
                    use_tanh=self.use_tanh, dtype=self.dtype,
                    split_last=self.split_last, gather_mode=self.gather_mode,
                    name="edge_lk",
                )(h["kp"], h["lig"], x["kp"], x["lig"], idx, valid)
                agg_h["kp"] = agg_h["kp"] + dh
                agg_x["kp"] = agg_x["kp"] + dx
            else:
                dense("lk", "lig", "kp", edges["lk"])
            # kk edge structure is data-driven (static pytree structure at
            # trace time): {"block": adj} | (idx, valid) nbr list | dense
            # (B,K,K) adjacency. Parameters are identical across layouts, so
            # the sampler may pick a different layout than training did
            # (e.g. compact_kk's exact capped nbr list).
            kk_struct = edges["kk"]
            if isinstance(kk_struct, dict):
                # banded block-dense kk: static windows, dense tile pairs
                from kpdiff_tpu.ops.spatial import block_windows

                adj = kk_struct["block"]
                b, nt, w, tile = adj.shape
                K = nt * tile
                F = h["kp"].shape[-1]
                hw = block_windows(h["kp"], tile).reshape(b * nt, w, F)
                xw = block_windows(x["kp"], tile).reshape(b * nt, w, 3)
                ht = h["kp"].reshape(b * nt, tile, F)
                xt = x["kp"].reshape(b * nt, tile, 3)
                mod = EGNNEdgeDense(
                    hidden_size=self.hidden_size, use_tanh=self.use_tanh,
                    coords_range=10.0, coord_hidden_layers=2, dtype=self.dtype,
                    split_last=self.split_last, name="edge_kk",
                )
                dh, dx = mod(hw, ht, xw, xt, adj.reshape(b * nt, w, tile))
                agg_h["kp"] = agg_h["kp"] + dh.reshape(b, K, F)
                agg_x["kp"] = agg_x["kp"] + dx.reshape(b, K, 3)
            elif not isinstance(kk_struct, tuple):
                dense("kk", "kp", "kp", kk_struct)
            else:
                idx, valid = kk_struct
                mod = EGNNEdgeNbrList(
                    hidden_size=self.hidden_size,
                    use_tanh=self.use_tanh,
                    coords_range=10.0,
                    coord_hidden_layers=2,
                    dtype=self.dtype,
                    split_last=self.split_last,
                    gather_mode=self.gather_mode,
                    name="edge_kk",
                )
                dh, dx = mod(h["kp"], h["kp"], x["kp"], x["kp"], idx, valid)
                agg_h["kp"] = agg_h["kp"] + dh
                agg_x["kp"] = agg_x["kp"] + dx

        updated = ["lig", "kp"] if self.update_kp_feat else ["lig"]
        h_out, x_out = dict(h), dict(x)
        for ntype in updated:
            hn = agg_h[ntype] / z[ntype]
            xn = agg_x[ntype] / z[ntype]
            new_h = NodeUpdate(self.hidden_size, self.hidden_size, norm=self.norm, dtype=self.dtype,
                               name=f"update_{ntype}")(h[ntype], hn)
            m = masks[ntype][..., None].astype(new_h.dtype)
            h_out[ntype] = new_h * m
            x_out[ntype] = (x[ntype] + xn) * m
        return h_out, x_out


class EGNNDynamics(nn.Module):
    """LigRecDynamics equivalent: encode features, append t, run n_layers
    of hetero EGNN, decode noise predictions (dynamics.py:298-441)."""

    atom_nf: int
    rec_nf: int  # keypoint feature size entering the dynamics
    n_layers: int = 6
    hidden_nf: int = 256
    use_tanh: bool = False
    message_norm: float = 1.0  # 0 -> normalize by avg in-degree + 1 (dynamics.py:281-285)
    update_kp_feat: bool = False
    norm: bool = False
    ll_k: int = 0
    kl_k: int = 0
    ll_cutoff: float = 9.0  # graph_cutoffs['ll']
    kl_cutoff: float = 8.0  # graph_cutoffs['kl']
    kk_layout: str = "dense"
    compute_dtype: str = "float32"  # 'bfloat16' for mixed-precision pair MLPs
    use_pallas: bool = False  # fused VMEM edge kernel (forward-only; sampling)
    # MXU-aligned t-channel: compute the hidden_nf+1-wide pair MLPs as an
    # aligned hidden_nf matmul + rank-1 correction (exact; models/egnn.py).
    # None/False = off. Measured slower on v5e TWICE: the round-2 (…,1)
    # e-channel layout (0.126->0.156 s/lig, BASELINE.md round-2) and the
    # round-5 squeezed (B,S,D) e-channel redesign (12.0 vs 9.1 ms/step on
    # the flagship — the extra e-channel fusions cost more scheduler time
    # than the 257->256 lane alignment saves; ROUND5.md). Kept as an exact
    # opt-in and for the Pallas kernel.
    mxu_split_t: bool = None
    # 'onehot' (default) computes neighbor-list/pair-list gathers as one-hot
    # matmuls — bitwise equal to 'take' and 1.25-1.94x faster on every nbr
    # variant (TPU dynamic gathers are slow relative to the MXU; BASELINE.md
    # round-3). 'proj' additionally moves the gathered-side first-layer
    # matmuls to node level (exact math, measured SLOWER — doubled gather
    # width outweighs the removed pair matmuls on an HBM-bound step);
    # 'take' = dynamic-gather HLO.
    nbr_gather: str = "onehot"
    # message_norm=0 semantics. 'intent' divides aggregated messages by the
    # per-graph avg in-degree + 1 (what dynamics.py:188-192 MEANS to do).
    # 'executed' replicates what the reference actually computes under DGL:
    # that loop mutates the FRESH dict returned by hetero `graph.ndata[...]`
    # (dgl/view.py HeteroNodeDataView.__getitem__), so the division is a
    # lost write and no normalization is applied (z == 1) — see
    # tests/refexec.py and tests/test_reference_execution.py. Use
    # 'executed' when importing shipped reference EGNN checkpoints (all of
    # which set message_norm: 0). Has no effect when message_norm != 0.
    z_semantics: str = "intent"
    # Rematerialize each conv layer in the backward pass (jax.checkpoint).
    # The training-step HBM peak is the stored per-layer pair tensors
    # (B,K,K,H) x n_layers from the dense kk grid; remat stores only the
    # node-level layer boundaries and recomputes pair work during backprop
    # (~1 extra forward of compute). Exact math. Required to train the
    # all-atom configs (K up to n_rec=384) at reference batch sizes on a
    # single 16G v5e chip.
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        lig_x: jnp.ndarray,  # (B, Nl, 3)
        lig_h: jnp.ndarray,  # (B, Nl, atom_nf)
        lig_mask: jnp.ndarray,  # (B, Nl)
        kp_x: jnp.ndarray,  # (B, K, 3)
        kp_h: jnp.ndarray,  # (B, K, rec_nf)
        kp_mask: jnp.ndarray,  # (B, K)
        t: jnp.ndarray,  # (B,)
        kk_edges=None,  # dense (B,K,K) bool, or (idx, valid) nbr list; required if update_kp_feat
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, nl = lig_mask.shape
        k = kp_mask.shape[1]

        # feature encoders (dynamics.py:313-334)
        lig_feat = MLP([64, self.hidden_nf], ["silu", "silu"], name="lig_encoder")(lig_h)
        if self.rec_nf != self.hidden_nf:
            kp_feat = MLP([2 * self.rec_nf, self.hidden_nf], ["silu", "silu"], name="kp_encoder")(kp_h)
        else:
            kp_feat = kp_h

        # append timestep channel
        t_lig = jnp.broadcast_to(t[:, None, None], (b, nl, 1)).astype(lig_feat.dtype)
        t_kp = jnp.broadcast_to(t[:, None, None], (b, k, 1)).astype(kp_feat.dtype)
        lig_feat = jnp.concatenate([lig_feat, t_lig], axis=-1)
        kp_feat = jnp.concatenate([kp_feat, t_kp], axis=-1)
        lig_feat = lig_feat * lig_mask[..., None]
        kp_feat = kp_feat * kp_mask[..., None]

        # rebuild ligand edges from current positions (dynamics.py:387-420)
        if self.ll_k > 0:
            ll = dense_knn_adjacency(lig_x, lig_mask, lig_x, lig_mask, self.ll_k, per="dst", exclude_self=True)
        else:
            ll = dense_radius_adjacency(lig_x, lig_mask, lig_x, lig_mask, self.ll_cutoff, exclude_self=True)
        edges: Dict[str, jnp.ndarray] = {"ll": ll}
        if self.kl_k > 0:
            # per-kp k-nearest ligand atoms as an explicit pair list
            kl_idx, _kl_dist, kl_valid = knn_indices(lig_x, lig_mask, kp_x, kp_mask, self.kl_k)
            kl_valid = kl_valid & kp_mask[:, :, None]
            edges["kl_pairs"] = (kl_idx, kl_valid)
            e_kl = jnp.sum(kl_valid, axis=(1, 2))
        else:
            kl = dense_radius_adjacency(kp_x, kp_mask, lig_x, lig_mask, self.kl_cutoff)
            edges["kl"] = kl
            e_kl = jnp.sum(kl, axis=(1, 2))
        if self.update_kp_feat:
            if self.kl_k == 0:
                edges["lk"] = jnp.swapaxes(edges["kl"], 1, 2)
            if kk_edges is None:
                raise ValueError("kk_edges required when update_kp_feat=True")
            edges["kk"] = kk_edges

        # message normalizers (dynamics.py:275-285): avg in-degree + 1 per graph
        z = {}
        if self.message_norm == 0 and self.z_semantics == "executed":
            # replicate the reference's lost write (see z_semantics docs)
            z["lig"] = 1.0
            z["kp"] = 1.0
        elif self.message_norm == 0:
            n_lig = jnp.maximum(jnp.sum(lig_mask, axis=1), 1)
            e_lig = jnp.sum(ll, axis=(1, 2)) + e_kl
            z["lig"] = (e_lig / n_lig + 1.0)[:, None, None]
            if self.update_kp_feat:
                n_kp = jnp.maximum(jnp.sum(kp_mask, axis=1), 1)
                kk_struct = edges["kk"]
                if isinstance(kk_struct, dict):
                    e_kk = jnp.sum(kk_struct["block"], axis=(1, 2, 3))
                elif not isinstance(kk_struct, tuple):
                    e_kk = jnp.sum(kk_struct, axis=(1, 2))
                else:
                    e_kk = jnp.sum(kk_struct[1], axis=(1, 2))
                e_kp = e_kl + e_kk  # lk edge count == kl edge count
                z["kp"] = (e_kp / n_kp + 1.0)[:, None, None]
            else:
                z["kp"] = 1.0
        else:
            z["lig"] = float(self.message_norm)
            z["kp"] = float(self.message_norm)

        # default OFF: measured on TPU v5e, the split path's extra elementwise
        # passes cost more than the matmul lane padding saves — the sampler
        # is HBM-bound, not MXU-bound (BASELINE.md round-2 notes). The exact
        # split math is kept for explicit opt-in and for the Pallas kernel.
        split_t = bool(self.mxu_split_t) if self.mxu_split_t is not None else False

        h = {"lig": lig_feat, "kp": kp_feat}
        x = {"lig": lig_x, "kp": kp_x}
        masks = {"lig": lig_mask, "kp": kp_mask}
        kp_h0, kp_x0 = kp_feat, kp_x

        Conv = nn.remat(EGNNConvLayer) if self.remat else EGNNConvLayer
        for i in range(self.n_layers):
            if not self.update_kp_feat:
                # reference re-reads original kp state every layer when kp is
                # not updated (dynamics.py:288-292)
                h["kp"], x["kp"] = kp_h0, kp_x0
            h, x = Conv(
                hidden_size=self.hidden_nf + 1,
                use_tanh=self.use_tanh,
                update_kp_feat=self.update_kp_feat,
                norm=self.norm,
                kk_layout=self.kk_layout,
                gather_mode=self.nbr_gather,
                dtype=self.compute_dtype,
                use_pallas=self.use_pallas,
                split_last=split_t,
                name=f"conv{i}",
            )(h, x, edges, z, masks)

        # decode (dynamics.py:376-381)
        h_lig = h["lig"][..., :-1]  # strip t channel
        eps_h = MLP([2 * self.atom_nf, self.atom_nf], ["silu", ""], name="lig_decoder")(h_lig)
        eps_x = x["lig"] - lig_x

        m = lig_mask[..., None]
        return eps_h * m, eps_x * m

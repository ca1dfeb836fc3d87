"""Geometric Vector Perceptron primitives and graph convolutions.

TPU re-design of the reference GVP library (models/gvp.py:43-550, itself
derived from lucidrains' geometric-vector-perceptron). All modules operate
on arbitrary leading dims: scalars (..., S) and vectors (..., V, 3), so the
same code runs per-node and per-dense-edge-pair.

Faithfulness notes:
  * Wh/Wu init U(-1/sqrt(fan_in), +) (gvp.py:63-69).
  * vector gating always on in the reference usage; gate = sigmoid (or
    identity in the final noise-prediction GVP).
  * GVPLayerNorm: torch LayerNorm on scalars; vectors divided by
    sqrt(mean_channel(||v||^2) + eps) + eps (gvp.py:152-166).
  * _VDropout drops whole vector channels (gvp.py:118-139).
  * message scalar inputs are [h_src, rbf(d)] (+ edge feats, + h_dst when
    use_dst_feats); vector inputs are [x_diff_unit, v_src (, v_dst)]
    (gvp.py:320-341,540-550).
  * x_diff normalized by clamped-norm + 1e-8 (gvp.py:286-288) — different
    from the EGNN's (d+1) normalization.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from kpdiff_tpu.models.nn import TorchLinear
from kpdiff_tpu.ops.geometry import norm_no_nan, rbf_embed

# ---------------------------------------------------------------------------
# Flat vector layout ("flat"): vectors are stored (..., 3V) v-major
# ([v0x v0y v0z v1x ...]) instead of (..., V, 3). A (..., V, 3) tensor tiles
# to (sublane V->pad8, lane 3->pad128) on TPU — ~40-60x memory/VPU waste at
# V=16-33 — which is what made the round-1 GVP stack layout-bound
# (BASELINE.md). The flat form pads only 3V->128 (~1.3-2.7x), and the
# channel-structured ops become small structured matmuls:
#   einsum('...vc,vh->...hc', v, W)  ==  v_flat @ kron(W, I3)
#   per-channel sum-of-squares       ==  square(v_flat) @ repeat(I_V, 3, 0)
#   per-channel gate broadcast       ==  gate @ repeat(I_V, 3, 0).T
# ---------------------------------------------------------------------------


def _kron3(w: jnp.ndarray) -> jnp.ndarray:
    """(V, H) -> (3V, 3H) with K[(v,c),(h,c')] = W[v,h] * delta_cc'."""
    v, h = w.shape
    eye = jnp.eye(3, dtype=w.dtype)
    return (w[:, None, :, None] * eye[None, :, None, :]).reshape(3 * v, 3 * h)


def _group3(n: int, dtype) -> jnp.ndarray:
    """(3n, n) selector: row (v,c) -> column v. x2 @ _group3 sums each
    channel's 3 components; gate @ _group3.T repeats each gate 3x."""
    return jnp.repeat(jnp.eye(n, dtype=dtype), 3, axis=0)


def flatten_vec(v: jnp.ndarray) -> jnp.ndarray:
    """(..., V, 3) -> (..., 3V) v-major (layer-boundary conversion)."""
    return v.reshape(*v.shape[:-2], v.shape[-2] * 3)


def unflatten_vec(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3V) v-major -> (..., V, 3)."""
    return v.reshape(*v.shape[:-1], v.shape[-1] // 3, 3)


class GVP(nn.Module):
    """One geometric vector perceptron (gvp.py:43-116)."""

    dim_vectors_in: int
    dim_vectors_out: int
    dim_feats_in: int
    dim_feats_out: int
    hidden_vectors: Optional[int] = None
    feats_activation: str = "silu"
    vectors_activation: str = "sigmoid"  # 'sigmoid' | 'identity'
    vector_gating: bool = True
    dtype: str = "float32"  # compute dtype (mixed precision)
    vec_layout: str = "vc"  # 'vc' (..., V, 3) | 'flat' (..., 3V) v-major

    @nn.compact
    def __call__(self, data: Tuple[jnp.ndarray, jnp.ndarray]):
        feats, vectors = data
        cd = jnp.dtype(self.dtype)
        feats = feats.astype(cd)
        vectors = vectors.astype(cd)
        v_in = self.dim_vectors_in
        dim_h = self.hidden_vectors or max(v_in, self.dim_vectors_out)
        flat = self.vec_layout == "flat"

        def uinit(bound):
            def init(key, shape, dtype=jnp.float32):
                return jax.random.uniform(key, shape, dtype, -bound, bound)

            return init

        Wh = self.param("Wh", uinit(1.0 / (v_in**0.5)), (v_in, dim_h))
        Wu = self.param("Wu", uinit(1.0 / (dim_h**0.5)), (dim_h, self.dim_vectors_out))

        if flat:
            Vh = vectors @ _kron3(Wh.astype(cd))  # (..., 3*dim_h)
            Vu = Vh @ _kron3(Wu.astype(cd))  # (..., 3*dim_vectors_out)
            # norm_no_nan per channel: clamp(sum of squares, 1e-8) then sqrt
            sh = jnp.sqrt(jnp.clip(
                jnp.square(Vh.astype(jnp.float32)) @ _group3(dim_h, jnp.float32), min=1e-8))
        else:
            Vh = jnp.einsum("...vc,vh->...hc", vectors, Wh.astype(cd), preferred_element_type=cd)
            Vu = jnp.einsum("...hc,hu->...uc", Vh, Wu.astype(cd), preferred_element_type=cd)
            sh = norm_no_nan(Vh, axis=-1)  # (..., dim_h)

        s = jnp.concatenate([feats, sh.astype(cd)], axis=-1)
        feats_out = TorchLinear(self.dim_feats_out, dtype=self.dtype, name="to_feats_out")(s)
        if self.feats_activation == "silu":
            feats_out = nn.silu(feats_out)
        elif self.feats_activation != "identity":
            raise ValueError(self.feats_activation)

        u = self.dim_vectors_out
        if self.vector_gating:
            gating = TorchLinear(u, dtype=self.dtype, name="scalar_to_vector_gates")(feats_out)
            if not flat:
                gating = gating[..., None]  # broadcast over the 3 components
        elif flat:
            gating = jnp.sqrt(jnp.clip(
                jnp.square(Vu.astype(jnp.float32)) @ _group3(u, jnp.float32), min=1e-8)).astype(cd)
        else:
            gating = norm_no_nan(Vu, axis=-1, keepdims=True)

        if self.vectors_activation == "sigmoid":
            gate = nn.sigmoid(gating)
        elif self.vectors_activation == "identity":
            gate = gating
        else:
            raise ValueError(self.vectors_activation)

        if flat:
            gate = gate @ _group3(u, gate.dtype).T  # repeat each channel gate 3x
        vectors_out = gate * Vu
        return feats_out, vectors_out


class GVPChain(nn.Module):
    """nn.Sequential of GVPs (message / update functions chain them)."""

    specs: Sequence[dict]
    dtype: str = "float32"
    vec_layout: str = "vc"

    @nn.compact
    def __call__(self, data):
        for i, spec in enumerate(self.specs):
            data = GVP(**spec, dtype=self.dtype, vec_layout=self.vec_layout, name=f"gvp{i}")(data)
        return data


class GVPLayerNorm(nn.Module):
    """Scalar LayerNorm + nontrainable vector norm (gvp.py:152-166)."""

    eps: float = 1e-5
    vec_layout: str = "vc"

    @nn.compact
    def __call__(self, feats, vectors):
        normed_feats = nn.LayerNorm(epsilon=self.eps)(feats)
        if self.vec_layout == "flat":
            nv = vectors.shape[-1] // 3
            sq = jnp.clip(jnp.square(vectors.astype(jnp.float32)) @ _group3(nv, jnp.float32),
                          min=1e-8)  # (..., V) per-channel sum of squares
            vn = jnp.sqrt(jnp.mean(sq, axis=-1, keepdims=True) + self.eps) + self.eps
            return normed_feats, vectors / vn.astype(vectors.dtype)
        vn = norm_no_nan(vectors, axis=-1, keepdims=True, sqrt=False)  # (..., V, 1)
        vn = jnp.sqrt(jnp.mean(vn, axis=-2, keepdims=True) + self.eps) + self.eps
        return normed_feats, vectors / vn


def gvp_dropout(key, feats, vectors, rate: float, deterministic: bool, vec_layout: str = "vc"):
    """Scalar dropout + vector-channel-coherent dropout (gvp.py:118-149)."""
    if deterministic or rate == 0.0:
        return feats, vectors
    k1, k2 = jax.random.split(key)
    keep = 1.0 - rate
    feats = feats * jax.random.bernoulli(k1, keep, feats.shape) / keep
    if vec_layout == "flat":
        vmask = jax.random.bernoulli(k2, keep, (*vectors.shape[:-1], vectors.shape[-1] // 3))
        vectors = vectors * jnp.repeat(vmask, 3, axis=-1) / keep
    else:
        vmask = jax.random.bernoulli(k2, keep, vectors.shape[:-1])[..., None]
        vectors = vectors * vmask / keep
    return feats, vectors


def _message_specs(scalar_size, vector_size, n_gvps, extra_scalars, extra_vectors):
    """GVP chain dims for an edge message fn (gvp.py:198-224,393-415)."""
    specs = []
    for i in range(n_gvps):
        dv_in = vector_size + (extra_vectors if i == 0 else 0)
        df_in = scalar_size + (extra_scalars if i == 0 else 0)
        specs.append(dict(
            dim_vectors_in=dv_in, dim_vectors_out=vector_size,
            dim_feats_in=df_in, dim_feats_out=scalar_size,
        ))
    return specs


def _update_specs(scalar_size, vector_size, n_gvps):
    return [
        dict(dim_vectors_in=vector_size, dim_vectors_out=vector_size,
             dim_feats_in=scalar_size, dim_feats_out=scalar_size)
        for _ in range(n_gvps)
    ]


class GVPEdgeMessagesDense(nn.Module):
    """GVP edge messages over a dense (B, Ns, Nd) pair grid, aggregated to
    destinations. agg='sum' or 'mean' over VALID incoming edges."""

    scalar_size: int
    vector_size: int
    n_message_gvps: int = 3
    rbf_dmax: float = 15.0
    rbf_dim: int = 16
    use_dst_feats: bool = False
    edge_feat_size: int = 0
    agg: str = "sum"
    dtype: str = "float32"
    vec_layout: str = "vc"  # 'flat': v_src/v_dst are (..., 3V); agg_v (..., 3V)

    @nn.compact
    def __call__(self, h_src, v_src, x_src, h_dst, v_dst, x_dst, adj, edge_feat=None):
        flat = self.vec_layout == "flat"
        # pair geometry (gvp.py:281-288)
        diff = x_src[:, :, None, :] - x_dst[:, None, :, :]  # (B,Ns,Nd,3)
        diff = jnp.where(adj[..., None], diff, 0.0)
        dij = norm_no_nan(diff, axis=-1, keepdims=True) + 1e-8
        x_unit = diff / dij
        rbf = rbf_embed(dij[..., 0], 0.0, self.rbf_dmax, self.rbf_dim)

        ns, nd = adj.shape[1], adj.shape[2]
        b = adj.shape[0]
        extra_v = 1 + (self.vector_size if self.use_dst_feats else 0)
        extra_s = self.rbf_dim + self.edge_feat_size + (self.scalar_size if self.use_dst_feats else 0)
        specs = _message_specs(self.scalar_size, self.vector_size, self.n_message_gvps, extra_s, extra_v)
        if flat:
            # factorized first GVP: per-node pieces stay per-node rank (the
            # broadcast happens in the post-matmul add); piece order matches
            # the reference concat order [h_src, rbf(, ef)(, h_dst)] /
            # [x_unit, v_src(, v_dst)]
            scl_pieces = [h_src[:, :, None, :], rbf]
            vec_pieces = [x_unit, v_src[:, :, None, :]]
            if self.edge_feat_size > 0:
                scl_pieces.append(edge_feat)
            if self.use_dst_feats:
                vec_pieces.append(v_dst[:, None, :, :])
                scl_pieces.append(h_dst[:, None, :, :])
            msg_s, msg_v = FactorizedGVPChain(specs, dtype=self.dtype, name="message")(
                scl_pieces, vec_pieces)
        else:
            vec_in = [x_unit[:, :, :, None, :], jnp.broadcast_to(v_src[:, :, None], (b, ns, nd, *v_src.shape[2:]))]
            scl_in = [jnp.broadcast_to(h_src[:, :, None], (b, ns, nd, h_src.shape[-1])), rbf]
            if self.edge_feat_size > 0:
                scl_in.append(edge_feat)
            if self.use_dst_feats:
                vec_in.append(jnp.broadcast_to(v_dst[:, None], (b, ns, nd, *v_dst.shape[2:])))
                scl_in.append(jnp.broadcast_to(h_dst[:, None], (b, ns, nd, h_dst.shape[-1])))
            vectors = jnp.concatenate(vec_in, axis=-2)
            scalars = jnp.concatenate(scl_in, axis=-1)
            msg_s, msg_v = GVPChain(
                specs, dtype=self.dtype, vec_layout=self.vec_layout, name="message",
            )((scalars, vectors))

        adj_f = adj.astype(msg_s.dtype)
        agg_s = jnp.einsum("bsd,bsdf->bdf", adj_f, msg_s, preferred_element_type=jnp.float32)
        if flat:
            agg_v = jnp.einsum("bsd,bsdf->bdf", adj_f, msg_v, preferred_element_type=jnp.float32)
        else:
            agg_v = jnp.einsum("bsd,bsdvc->bdvc", adj_f, msg_v, preferred_element_type=jnp.float32)
        if self.agg == "mean":
            cnt = jnp.maximum(jnp.sum(adj_f, axis=1), 1.0)  # (B, Nd)
            agg_s = agg_s / cnt[..., None]
            agg_v = agg_v / (cnt[..., None] if flat else cnt[..., None, None])
        return agg_s, agg_v


class GVPEdgeMessagesNbr(nn.Module):
    """GVP edge messages over a destination-major neighbor list
    (B, Nd, K) of source indices — for pocket-scale edge sets (rr, rk)
    where a dense pair grid would waste HBM. Aggregation = masked sum or
    mean over the K axis (no scatter)."""

    scalar_size: int
    vector_size: int
    n_message_gvps: int = 3
    rbf_dmax: float = 15.0
    rbf_dim: int = 16
    use_dst_feats: bool = False
    edge_feat_size: int = 0
    agg: str = "sum"
    dtype: str = "float32"
    vec_layout: str = "vc"  # 'flat': v_src/v_dst are (..., 3V); agg_v (..., 3V)
    gather_mode: str = "take"  # 'onehot': gathers as one-hot matmuls (exact)

    @nn.compact
    def __call__(self, h_src, v_src, x_src, h_dst, v_dst, x_dst, nbr_idx, nbr_valid, edge_feat=None):
        flat = self.vec_layout == "flat"
        b, nd, kn = nbr_idx.shape
        if self.gather_mode == "onehot":
            from kpdiff_tpu.ops.neighbors import onehot_gather

            h_nbr, x_nbr, v_nbr = onehot_gather([h_src, x_src, v_src], nbr_idx)
        else:
            h_nbr = jnp.take_along_axis(h_src[:, :, None, :], nbr_idx[..., None], axis=1)  # (B,Nd,K,S)
            x_nbr = jnp.take_along_axis(x_src[:, :, None, :], nbr_idx[..., None], axis=1)  # (B,Nd,K,3)
            if flat:
                v_nbr = jnp.take_along_axis(v_src[:, :, None, :], nbr_idx[..., None], axis=1)  # (B,Nd,K,3V)
            else:
                v_nbr = jnp.take_along_axis(v_src[:, :, None, :, :], nbr_idx[..., None, None], axis=1)  # (B,Nd,K,V,3)

        diff = x_nbr - x_dst[:, :, None, :]
        diff = jnp.where(nbr_valid[..., None], diff, 0.0)
        dij = norm_no_nan(diff, axis=-1, keepdims=True) + 1e-8
        x_unit = diff / dij
        rbf = rbf_embed(dij[..., 0], 0.0, self.rbf_dmax, self.rbf_dim)

        extra_v = 1 + (self.vector_size if self.use_dst_feats else 0)
        extra_s = self.rbf_dim + self.edge_feat_size + (self.scalar_size if self.use_dst_feats else 0)
        specs = _message_specs(self.scalar_size, self.vector_size, self.n_message_gvps, extra_s, extra_v)
        if flat:
            scl_pieces = [h_nbr, rbf]
            vec_pieces = [x_unit, v_nbr]
            if self.edge_feat_size > 0:
                scl_pieces.append(edge_feat)
            if self.use_dst_feats:
                vec_pieces.append(v_dst[:, :, None, :])
                scl_pieces.append(h_dst[:, :, None, :])
            msg_s, msg_v = FactorizedGVPChain(specs, dtype=self.dtype, name="message")(
                scl_pieces, vec_pieces)
        else:
            vec_in = [x_unit[:, :, :, None, :], v_nbr]
            scl_in = [h_nbr, rbf]
            if self.edge_feat_size > 0:
                scl_in.append(edge_feat)
            if self.use_dst_feats:
                vec_in.append(jnp.broadcast_to(v_dst[:, :, None], (b, nd, kn, *v_dst.shape[2:])))
                scl_in.append(jnp.broadcast_to(h_dst[:, :, None], (b, nd, kn, h_dst.shape[-1])))
            vectors = jnp.concatenate(vec_in, axis=-2)
            scalars = jnp.concatenate(scl_in, axis=-1)
            msg_s, msg_v = GVPChain(
                specs, dtype=self.dtype, vec_layout=self.vec_layout, name="message",
            )((scalars, vectors))

        vf = nbr_valid[..., None].astype(msg_s.dtype)
        agg_s = jnp.sum((msg_s * vf).astype(jnp.float32), axis=2)
        agg_v = jnp.sum((msg_v * (vf if flat else vf[..., None])).astype(jnp.float32), axis=2)
        if self.agg == "mean":
            cnt = jnp.maximum(jnp.sum(vf, axis=2), 1.0)  # (B,Nd,1)
            agg_s = agg_s / cnt
            agg_v = agg_v / (cnt if flat else cnt[..., None])
        return agg_s, agg_v


class GVPEdgeMessagesKNNPairs(nn.Module):
    """GVP edge messages on a kNN pair list anchored at one node set.

    For knn-built kl edges (each keypoint -> its kl_k nearest ligand atoms,
    reference dynamics_gvp.py:201-234) the true edge count is K*kl_k, ~5-10x
    smaller than the dense K x Nl grid the round-1 port used. kl and its
    reverse lk share the SAME (B, K, k) structure of ligand indices:
      * anchor_is_src=True  (kl): the anchor (kp) sends to the gathered
        nodes; aggregation scatters to the gathered side via a one-hot
        matmul (tiny: (B, K*k, N) x (B, K*k, F)).
      * anchor_is_src=False (lk): gathered nodes send to the anchor;
        aggregation is a masked sum over the k axis.
    Identical parameter layout to GVPEdgeMessagesDense (swap-in).
    """

    scalar_size: int
    vector_size: int
    anchor_is_src: bool
    n_message_gvps: int = 3
    rbf_dmax: float = 15.0
    rbf_dim: int = 16
    use_dst_feats: bool = False
    edge_feat_size: int = 0
    agg: str = "sum"
    dtype: str = "float32"
    vec_layout: str = "vc"
    gather_mode: str = "take"  # 'onehot': gathers as one-hot matmuls (exact)

    @nn.compact
    def __call__(self, h_anchor, v_anchor, x_anchor, h_other, v_other, x_other, idx, valid):
        flat = self.vec_layout == "flat"
        b, K, k = idx.shape
        n_other = h_other.shape[1]

        if self.gather_mode == "onehot":
            from kpdiff_tpu.ops.neighbors import onehot_gather

            h_g, x_g, v_g = onehot_gather([h_other, x_other, v_other], idx)
        else:
            h_g = jnp.take_along_axis(h_other[:, :, None, :], idx[..., None], axis=1)  # (B,K,k,S)
            x_g = jnp.take_along_axis(x_other[:, :, None, :], idx[..., None], axis=1)  # (B,K,k,3)
            if flat:
                v_g = jnp.take_along_axis(v_other[:, :, None, :], idx[..., None], axis=1)
            else:
                v_g = jnp.take_along_axis(v_other[:, :, None, :, :], idx[..., None, None], axis=1)

        if self.anchor_is_src:
            diff = x_anchor[:, :, None, :] - x_g  # x_src - x_dst (gvp.py:281-288)
        else:
            diff = x_g - x_anchor[:, :, None, :]
        diff = jnp.where(valid[..., None], diff, 0.0)
        dij = norm_no_nan(diff, axis=-1, keepdims=True) + 1e-8
        x_unit = diff / dij
        rbf = rbf_embed(dij[..., 0], 0.0, self.rbf_dmax, self.rbf_dim)

        if flat:
            # lazily-expanded anchor pieces: the factorized first GVP never
            # materializes the broadcast (the add after the matmul does it)
            anchor_h, anchor_v = h_anchor[:, :, None, :], v_anchor[:, :, None, :]
        else:
            anchor_h = jnp.broadcast_to(h_anchor[:, :, None], (b, K, k, h_anchor.shape[-1]))
            anchor_v = jnp.broadcast_to(v_anchor[:, :, None], (b, K, k, *v_anchor.shape[2:]))

        if self.anchor_is_src:
            h_src_e, v_src_e = anchor_h, anchor_v
            h_dst_e, v_dst_e = h_g, v_g
        else:
            h_src_e, v_src_e = h_g, v_g
            h_dst_e, v_dst_e = anchor_h, anchor_v

        extra_v = 1 + (self.vector_size if self.use_dst_feats else 0)
        extra_s = self.rbf_dim + self.edge_feat_size + (self.scalar_size if self.use_dst_feats else 0)
        specs = _message_specs(self.scalar_size, self.vector_size, self.n_message_gvps, extra_s, extra_v)
        if flat:
            msg_s, msg_v = FactorizedGVPChain(specs, dtype=self.dtype, name="message")(
                [h_src_e, rbf] + ([h_dst_e] if self.use_dst_feats else []),
                [x_unit, v_src_e] + ([v_dst_e] if self.use_dst_feats else []))
        else:
            vec_in = [x_unit[:, :, :, None, :], v_src_e]
            scl_in = [h_src_e, rbf]
            if self.use_dst_feats:
                vec_in.append(v_dst_e)
                scl_in.append(h_dst_e)
            vectors = jnp.concatenate(vec_in, axis=-2)
            scalars = jnp.concatenate(scl_in, axis=-1)
            msg_s, msg_v = GVPChain(
                specs, dtype=self.dtype, vec_layout=self.vec_layout, name="message",
            )((scalars, vectors))

        vf = valid[..., None].astype(msg_s.dtype)
        if self.anchor_is_src:
            # scatter to the gathered (other) side via one-hot matmul
            onehot = (jax.nn.one_hot(idx, n_other, dtype=msg_s.dtype)
                      * vf).reshape(b, K * k, n_other)
            agg_s = jnp.einsum("ben,bef->bnf", onehot, msg_s.reshape(b, K * k, -1),
                               preferred_element_type=jnp.float32)
            mvflat = msg_v.reshape(b, K * k, -1)
            agg_v = jnp.einsum("ben,bef->bnf", onehot, mvflat, preferred_element_type=jnp.float32)
            if not flat:
                agg_v = agg_v.reshape(b, n_other, *msg_v.shape[3:])
            if self.agg == "mean":
                cnt = jnp.maximum(jnp.sum(onehot, axis=1), 1.0)  # (B, N_other)
                agg_s = agg_s / cnt[..., None]
                agg_v = agg_v / (cnt[..., None] if flat else cnt[..., None, None])
            return agg_s, agg_v

        agg_s = jnp.sum((msg_s * vf).astype(jnp.float32), axis=2)
        agg_v = jnp.sum((msg_v * (vf if flat else vf[..., None])).astype(jnp.float32), axis=2)
        if self.agg == "mean":
            cnt = jnp.maximum(jnp.sum(vf, axis=2), 1.0)  # (B,K,1)
            agg_s = agg_s / cnt
            agg_v = agg_v / (cnt if flat else cnt[..., None])
        return agg_s, agg_v


class _SplitLinear(nn.Module):
    """TorchLinear over a CONCATENATION, computed without materializing it:
    y = concat(pieces) @ K + b == sum_i pieces[i] @ K[rows_i] + b.
    Parameter names/shapes/init identical to TorchLinear at fan_in =
    sum of piece widths, so the param tree matches the concat formulation."""

    features: int
    fan_in: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, pieces):
        from kpdiff_tpu.models.nn import torch_bias_init, torch_kernel_init

        kernel = self.param("kernel", torch_kernel_init, (self.fan_in, self.features))
        bias = self.param("bias", lambda k, s: torch_bias_init(k, s, fan_in=self.fan_in),
                          (self.features,))
        cd = jnp.dtype(self.dtype)
        kc = kernel.astype(cd)
        off, y = 0, None
        for piece in pieces:
            w = piece.shape[-1]
            t = piece.astype(cd) @ kc[off:off + w]
            y = t if y is None else y + t
            off += w
        assert off == self.fan_in, (off, self.fan_in)
        return y + bias.astype(cd)


class GVPFactorizedFirst(nn.Module):
    """First GVP of an edge-message chain with the concat inputs factorized
    (flat vec layout only). Edge-message inputs are concats of PER-NODE
    tensors (broadcast to pair rank) and per-pair tensors; computing
    piece @ W_slice before the broadcast-add moves the wide matmuls to
    per-node cost and never materializes the broadcast concat — the same
    trick as the EGNN first-layer factorization (models/egnn.py).
    Parameter tree identical to GVP (Wh, Wu, to_feats_out,
    scalar_to_vector_gates)."""

    dim_vectors_in: int
    dim_vectors_out: int
    dim_feats_in: int
    dim_feats_out: int
    hidden_vectors: Optional[int] = None
    feats_activation: str = "silu"
    vectors_activation: str = "sigmoid"
    vector_gating: bool = True
    dtype: str = "float32"

    @nn.compact
    def __call__(self, scalar_pieces, vector_pieces):
        cd = jnp.dtype(self.dtype)
        v_in = self.dim_vectors_in
        dim_h = self.hidden_vectors or max(v_in, self.dim_vectors_out)

        def uinit(bound):
            def init(key, shape, dtype=jnp.float32):
                return jax.random.uniform(key, shape, dtype, -bound, bound)

            return init

        Wh = self.param("Wh", uinit(1.0 / (v_in**0.5)), (v_in, dim_h))
        Wu = self.param("Wu", uinit(1.0 / (dim_h**0.5)), (dim_h, self.dim_vectors_out))

        Wh3 = _kron3(Wh.astype(cd))
        off, Vh = 0, None
        for piece in vector_pieces:
            w3 = piece.shape[-1]
            t = piece.astype(cd) @ Wh3[off:off + w3]
            Vh = t if Vh is None else Vh + t
            off += w3
        assert off == 3 * v_in, (off, 3 * v_in)
        Vu = Vh @ _kron3(Wu.astype(cd))
        sh = jnp.sqrt(jnp.clip(
            jnp.square(Vh.astype(jnp.float32)) @ _group3(dim_h, jnp.float32), min=1e-8))

        feats_out = _SplitLinear(
            self.dim_feats_out, self.dim_feats_in + dim_h, dtype=self.dtype,
            name="to_feats_out",
        )(list(scalar_pieces) + [sh])
        if self.feats_activation == "silu":
            feats_out = nn.silu(feats_out)
        elif self.feats_activation != "identity":
            raise ValueError(self.feats_activation)

        u = self.dim_vectors_out
        if self.vector_gating:
            gating = TorchLinear(u, dtype=self.dtype, name="scalar_to_vector_gates")(feats_out)
        else:
            gating = jnp.sqrt(jnp.clip(
                jnp.square(Vu.astype(jnp.float32)) @ _group3(u, jnp.float32), min=1e-8)).astype(cd)
        if self.vectors_activation == "sigmoid":
            gate = nn.sigmoid(gating)
        elif self.vectors_activation == "identity":
            gate = gating
        else:
            raise ValueError(self.vectors_activation)
        return feats_out, (gate @ _group3(u, gate.dtype).T) * Vu


class FactorizedGVPChain(nn.Module):
    """GVPChain whose first GVP takes factorized (unmaterialized) concat
    inputs; param paths identical to GVPChain (gvp0, gvp1, ...)."""

    specs: Sequence[dict]
    dtype: str = "float32"

    @nn.compact
    def __call__(self, scalar_pieces, vector_pieces):
        data = GVPFactorizedFirst(**self.specs[0], dtype=self.dtype, name="gvp0")(
            scalar_pieces, vector_pieces)
        for i, spec in enumerate(self.specs[1:], start=1):
            data = GVP(**spec, dtype=self.dtype, vec_layout="flat", name=f"gvp{i}")(data)
        return data

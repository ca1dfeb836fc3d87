"""GVP dynamics parity vs an independent torch reimplementation of the
reference GVP semantics (models/gvp.py + models/dynamics_gvp.py), through
the GVP branch of the checkpoint converter."""
import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from kpdiff_tpu.models.diffusion import DiffusionConfig, KeypointDiffusion
from kpdiff_tpu.ops.neighbors import dense_radius_adjacency
from kpdiff_tpu.utils.torch_import import convert_gvp_dynamics_state_dict

S = 12          # hidden scalars
V = 4           # vector channels
ATOM_NF = 6
KP_NF = 5
N_CONVS = 2
N_MSG = 2
N_UPD = 1
N_NOISE = 2
KL_K = 2
LL_CUT = 6.0
KK_CUT = 4.0
RBF_DMAX = 15.0
RBF_DIM = 16


def t_norm_no_nan(x, axis=-1, keepdims=False, eps=1e-8, sqrt=True):
    out = torch.clamp((x**2).sum(axis, keepdim=keepdims), min=eps)
    return torch.sqrt(out) if sqrt else out


def t_rbf(d, d_max=RBF_DMAX, d_count=RBF_DIM):
    mu = torch.linspace(0, d_max, d_count)
    sigma = d_max / d_count
    return torch.exp(-(((d[..., None] - mu) / sigma) ** 2))


class TGVP(tnn.Module):
    def __init__(self, v_in, v_out, f_in, f_out, vec_act="sigmoid"):
        super().__init__()
        dim_h = max(v_in, v_out)
        self.Wh = tnn.Parameter(torch.zeros(v_in, dim_h).uniform_(-1, 1) / v_in**0.5)
        self.Wu = tnn.Parameter(torch.zeros(dim_h, v_out).uniform_(-1, 1) / dim_h**0.5)
        self.to_feats_out = tnn.Sequential(tnn.Linear(dim_h + f_in, f_out), tnn.SiLU())
        self.scalar_to_vector_gates = tnn.Linear(f_out, v_out)
        self.vec_act = vec_act

    def forward(self, data):
        feats, vectors = data
        Vh = torch.einsum("nvc,vh->nhc", vectors, self.Wh)
        Vu = torch.einsum("nhc,hu->nuc", Vh, self.Wu)
        sh = t_norm_no_nan(Vh)
        f_out = self.to_feats_out(torch.cat([feats, sh], dim=1))
        gate = self.scalar_to_vector_gates(f_out)[..., None]
        if self.vec_act == "sigmoid":
            gate = torch.sigmoid(gate)
        return f_out, gate * Vu


class TorchRefGVPDynamics(tnn.Module):
    """Independent torch reimplementation of LigRecDynamicsGVP semantics."""

    def __init__(self, update_kp=True, message_norm="mean"):
        super().__init__()
        act = tnn.SiLU
        self.update_kp = update_kp
        self.message_norm = message_norm
        self.lig_encoder = tnn.Sequential(tnn.Linear(ATOM_NF + 1, S), act(), tnn.LayerNorm(S))
        self.kp_encoder = tnn.Sequential(tnn.Linear(KP_NF + 1, S), act(), tnn.LayerNorm(S))

        no_kp = [("lig", "ll", "lig"), ("kp", "kl", "lig")]
        with_kp = no_kp + [("lig", "lk", "kp"), ("kp", "kk", "kp")]

        class Conv(tnn.Module):
            def __init__(self, etypes):
                super().__init__()
                self.etypes = etypes
                self.edge_message_fns = tnn.ModuleDict()
                for st, en, dt in etypes:
                    gvps = []
                    for j in range(N_MSG):
                        vi = V + 1 if j == 0 else V
                        fi = S + RBF_DIM if j == 0 else S
                        gvps.append(TGVP(vi, V, fi, S))
                    self.edge_message_fns[f"{st}_{en}_{dt}"] = tnn.Sequential(*gvps)
                self.node_update_fns = tnn.ModuleDict()
                self.message_layer_norms = tnn.ModuleDict()
                self.update_layer_norms = tnn.ModuleDict()
                for nt in sorted({e[2] for e in etypes}):
                    self.node_update_fns[nt] = tnn.Sequential(*[TGVP(V, V, S, S) for _ in range(N_UPD)])
                    ln1 = tnn.Module()
                    ln1.feat_norm = tnn.LayerNorm(S)
                    ln2 = tnn.Module()
                    ln2.feat_norm = tnn.LayerNorm(S)
                    self.message_layer_norms[nt] = ln1
                    self.update_layer_norms[nt] = ln2

        class Wrap(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv_layers = tnn.ModuleList([
                    Conv(with_kp if (update_kp and i != N_CONVS - 1) else no_kp) for i in range(N_CONVS)
                ])
                npb = tnn.Module()
                gvps = []
                for j in range(N_NOISE):
                    last = j == N_NOISE - 1
                    gvps.append(TGVP(V, 1 if last else V, S, 64 if last else S,  # intermediate_scalar_dim=64 (reference default)
                                     vec_act="identity" if last else "sigmoid"))
                npb.gvps = tnn.Sequential(*gvps)
                npb.to_scalar_output = tnn.Linear(64, ATOM_NF)
                self.noise_predictor = npb

        self.noise_predictor = Wrap()

    @staticmethod
    def gvp_layer_norm(ln, feats, vectors):
        vn = t_norm_no_nan(vectors, keepdims=True, sqrt=False)
        vn = torch.sqrt(vn.mean(-2, keepdim=True) + 1e-5) + 1e-5
        return ln.feat_norm(feats), vectors / vn

    def forward(self, lig_x, lig_h, kp_x, kp_h, kp_v, t, edges):
        nl, nk = lig_x.shape[0], kp_x.shape[0]
        lig_s = self.lig_encoder(torch.cat([lig_h, torch.full((nl, 1), t)], dim=1))
        kp_s = self.kp_encoder(torch.cat([kp_h, torch.full((nk, 1), t)], dim=1))
        h = {"lig": lig_s, "kp": kp_s}
        v = {"lig": torch.zeros(nl, V, 3), "kp": kp_v.clone()}
        x = {"lig": lig_x, "kp": kp_x}

        for conv in self.noise_predictor.conv_layers:
            dst_ntypes = sorted({e[2] for e in conv.etypes})
            agg_s = {nt: torch.zeros(h[nt].shape) for nt in dst_ntypes}
            agg_v = {nt: torch.zeros(v[nt].shape) for nt in dst_ntypes}
            for st, en, dt in conv.etypes:
                src_idx, dst_idx = edges[en]
                if len(src_idx) == 0:
                    continue
                diff = x[st][src_idx] - x[dt][dst_idx]
                dij = t_norm_no_nan(diff, keepdims=True) + 1e-8
                x_unit = diff / dij
                vecs = torch.cat([x_unit[:, None, :], v[st][src_idx]], dim=1)
                scls = torch.cat([h[st][src_idx], t_rbf(dij[:, 0])], dim=1)
                ms, mv = conv.edge_message_fns[f"{st}_{en}_{dt}"]((scls, vecs))
                if self.message_norm == "mean":
                    cnt = torch.zeros(len(h[dt])).index_add_(0, dst_idx, torch.ones(len(dst_idx)))
                    cnt = torch.clamp(cnt, min=1)[:, None]
                    agg_s[dt] += torch.zeros_like(agg_s[dt]).index_add_(0, dst_idx, ms) / cnt
                    agg_v[dt] += torch.zeros_like(agg_v[dt]).index_add_(0, dst_idx, mv) / cnt[..., None]
                else:
                    agg_s[dt] += torch.zeros_like(agg_s[dt]).index_add_(0, dst_idx, ms) / self.message_norm
                    agg_v[dt] += torch.zeros_like(agg_v[dt]).index_add_(0, dst_idx, mv) / self.message_norm
            for nt in dst_ntypes:
                hs = h[nt] + agg_s[nt]
                vs = v[nt] + agg_v[nt]
                hs, vs = self.gvp_layer_norm(conv.message_layer_norms[nt], hs, vs)
                rs, rv = conv.node_update_fns[nt]((hs, vs))
                hs = hs + rs
                vs = vs + rv
                h[nt], v[nt] = self.gvp_layer_norm(conv.update_layer_norms[nt], hs, vs)

        s, vec = self.noise_predictor.noise_predictor.gvps((h["lig"], v["lig"]))
        eps_h = self.noise_predictor.noise_predictor.to_scalar_output(s)
        return eps_h, vec[:, 0, :]


def build_edges(lig_x, kp_x):
    nl, nk = lig_x.shape[0], kp_x.shape[0]
    def radius_edges(xs, cut):
        s, d = [], []
        for i in range(xs.shape[0]):
            for j in range(xs.shape[0]):
                if i != j and torch.linalg.vector_norm(xs[i] - xs[j]) < cut:
                    s.append(i); d.append(j)
        return torch.tensor(s, dtype=torch.long), torch.tensor(d, dtype=torch.long)
    ll = radius_edges(lig_x, LL_CUT)
    kk = radius_edges(kp_x, KK_CUT)
    skl, dkl = [], []
    for k in range(nk):
        dists = torch.linalg.vector_norm(lig_x - kp_x[k], dim=1)
        for j in torch.argsort(dists)[:KL_K].tolist():
            skl.append(k); dkl.append(j)
    kl = (torch.tensor(skl, dtype=torch.long), torch.tensor(dkl, dtype=torch.long))
    return {"ll": ll, "kl": kl, "lk": (kl[1], kl[0]), "kk": kk}


@pytest.mark.slow
@pytest.mark.parametrize("message_norm", ["mean", 10.0])
def test_gvp_dynamics_matches_independent_torch_impl(message_norm):
    torch.manual_seed(3)
    rng = np.random.default_rng(3)
    NL, NK = 7, 5
    lig_x = torch.tensor(rng.normal(size=(NL, 3)) * 2, dtype=torch.float32)
    lig_h = torch.tensor(rng.normal(size=(NL, ATOM_NF)), dtype=torch.float32)
    kp_x = torch.tensor(rng.normal(size=(NK, 3)) * 3, dtype=torch.float32)
    kp_h = torch.tensor(rng.normal(size=(NK, KP_NF)), dtype=torch.float32)
    kp_v = torch.tensor(rng.normal(size=(NK, V, 3)), dtype=torch.float32)
    t_val = 0.6

    ref = TorchRefGVPDynamics(message_norm=message_norm)
    edges = build_edges(lig_x, kp_x)
    with torch.no_grad():
        eps_h_t, eps_x_t = ref(lig_x, lig_h, kp_x, kp_h, kp_v, t_val, edges)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    # strip the 'noise_predictor.' top wrap? converter expects reference paths:
    # lig_encoder.*, kp_encoder.*, noise_predictor.conv_layers.*,
    # noise_predictor.noise_predictor.* — matches this module exactly.
    params_dyn = convert_gvp_dynamics_state_dict(
        sd, n_convs=N_CONVS, update_kp=True, n_message_gvps=N_MSG,
        n_update_gvps=N_UPD, n_noise_gvps=N_NOISE,
    )

    cfg = DiffusionConfig(
        atom_nf=ATOM_NF, rec_nf=KP_NF, n_timesteps=10, architecture="gvp", rec_encoder_type="fixed",
        graph_cutoffs={"rr": KK_CUT, "kk": KK_CUT, "kl": 8, "ll": LL_CUT, "rk": 100},
        rec_encoder=dict(vector_size=V),
        dynamics=dict(vector_size=V, n_convs=N_CONVS, n_hidden_scalars=S, update_kp=True,
                      message_norm=message_norm, ll_k=0, kl_k=KL_K,
                      n_message_gvps=N_MSG, n_update_gvps=N_UPD, n_noise_gvps=N_NOISE),
    )
    model = KeypointDiffusion(cfg)
    # our NoisePredictionBlock uses intermediate_scalar_dim=64 by default; the
    # torch ref used 8 — align via the module default? The converter carries
    # the torch shapes, so apply with the converted params directly.
    lig_mask = jnp.ones((1, NL), bool)
    kp_mask = jnp.ones((1, NK), bool)
    kk = dense_radius_adjacency(jnp.asarray(kp_x.numpy())[None], kp_mask,
                                jnp.asarray(kp_x.numpy())[None], kp_mask, KK_CUT, exclude_self=True)
    eps_h_j, eps_x_j = model._apply_dynamics(
        {"dynamics": jax.tree_util.tree_map(jnp.asarray, params_dyn)},
        jnp.asarray(lig_x.numpy())[None], jnp.asarray(lig_h.numpy())[None], lig_mask,
        jnp.asarray(kp_x.numpy())[None], jnp.asarray(kp_h.numpy())[None], kp_mask,
        jnp.full((1,), t_val), kk, jnp.asarray(kp_v.numpy())[None],
    )

    np.testing.assert_allclose(np.asarray(eps_h_j)[0], eps_h_t.numpy(), rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(eps_x_j)[0], eps_x_t.numpy(), rtol=5e-4, atol=5e-5)

"""Numerical parity vs an INDEPENDENT torch reimplementation of the
reference EGNN dynamics semantics (models/dynamics.py), plus the
state_dict converter. This is the strongest available parity check while
the released checkpoints are stripped (SURVEY.md §5.4): same weights in,
same noise predictions out.
"""
import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from kpdiff_tpu.models.diffusion import DiffusionConfig, KeypointDiffusion
from kpdiff_tpu.models.complex import make_complex
from kpdiff_tpu.ops.neighbors import dense_radius_adjacency
from kpdiff_tpu.utils.torch_import import convert_egnn_dynamics_state_dict

HID = 8  # hidden_nf; feature width inside the EGNN is HID+1
ATOM_NF = 6
REC_NF = 5
N_LAYERS = 2
KL_K = 2
LL_CUT = 6.0
KK_CUT = 4.0


class TorchRefDynamics(tnn.Module):
    """Pure-torch reimplementation of LigRecDynamics semantics over edge
    lists (independent of DGL; written from the reference's math)."""

    def __init__(self, message_norm=1.0):
        super().__init__()
        F = HID + 1
        act = tnn.SiLU
        self.message_norm = message_norm
        self.lig_encoder = tnn.Sequential(tnn.Linear(ATOM_NF, 64), act(), tnn.Linear(64, HID), act())
        self.rec_encoder = tnn.Sequential(tnn.Linear(REC_NF, 2 * REC_NF), act(), tnn.Linear(2 * REC_NF, HID), act())
        self.lig_decoder = tnn.Sequential(tnn.Linear(HID, 2 * ATOM_NF), act(), tnn.Linear(2 * ATOM_NF, ATOM_NF))

        class Conv(tnn.Module):
            def __init__(self):
                super().__init__()
                self.edge_mlp = tnn.ModuleDict()
                self.soft_attention = tnn.ModuleDict()
                self.coord_mlp = tnn.ModuleDict()
                self.node_mlp = tnn.ModuleDict()
                self.layer_norm = tnn.ModuleDict()
                for et in ["ll", "kl", "lk", "kk"]:
                    self.edge_mlp[et] = tnn.Sequential(tnn.Linear(2 * F + 1, F), act(), tnn.Linear(F, F), act())
                    self.soft_attention[et] = tnn.Sequential(tnn.Linear(F, 1), tnn.Sigmoid())
                    self.coord_mlp[et] = tnn.Sequential(
                        tnn.Linear(2 * F + 1, F), act(), tnn.Linear(F, F), act(), tnn.Linear(F, 1, bias=False)
                    )
                for nt in ["lig", "kp"]:
                    self.node_mlp[nt] = tnn.Sequential(tnn.Linear(2 * F, F), act(), tnn.Linear(F, F))
                    self.layer_norm[nt] = tnn.LayerNorm(F)

        class EGNNWrap(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv_layers = tnn.ModuleList([Conv() for _ in range(N_LAYERS)])

        self.egnn = EGNNWrap()

    @staticmethod
    def _edges_msg(conv, et, h_src, h_dst, x_src, x_dst, src_idx, dst_idx, use_tanh=True, coords_range=10.0):
        hs = h_src[src_idx]
        hd = h_dst[dst_idx]
        diff = x_src[src_idx] - x_dst[dst_idx]
        dij = torch.linalg.vector_norm(diff, dim=1, keepdim=True)
        x_unit = diff / (dij + 1)
        f = torch.cat([hs, hd, dij], dim=1)
        m = conv.edge_mlp[et](f)
        m = m * conv.soft_attention[et](m)
        # executed reference behavior: coord messages on EVERY edge type
        s = conv.coord_mlp[et](f)
        mx = torch.tanh(s) * x_unit * coords_range if use_tanh else s * x_unit
        return m, mx

    def forward(self, lig_x, lig_h, kp_x, kp_h, t, edges):
        lig_feat = self.lig_encoder(lig_h)
        kp_feat = self.rec_encoder(kp_h)
        nl, nk = lig_feat.shape[0], kp_feat.shape[0]
        lig_feat = torch.cat([lig_feat, torch.full((nl, 1), t)], dim=1)
        kp_feat = torch.cat([kp_feat, torch.full((nk, 1), t)], dim=1)

        h = {"lig": lig_feat, "kp": kp_feat}
        x = {"lig": lig_x.clone(), "kp": kp_x.clone()}

        # message_norm==0: z = avg in-degree + 1 per updated ntype
        if self.message_norm == 0:
            e_lig = edges["ll"][0].shape[0] + edges["kl"][0].shape[0]
            e_kp = edges["lk"][0].shape[0] + edges["kk"][0].shape[0]
            z = {"lig": e_lig / nl + 1.0, "kp": e_kp / nk + 1.0}
        else:
            z = {"lig": self.message_norm, "kp": self.message_norm}

        spec = {"ll": ("lig", "lig"), "kl": ("kp", "lig"), "lk": ("lig", "kp"), "kk": ("kp", "kp")}
        for conv in self.egnn.conv_layers:
            agg_h = {"lig": torch.zeros(nl, HID + 1), "kp": torch.zeros(nk, HID + 1)}
            agg_x = {"lig": torch.zeros(nl, 3), "kp": torch.zeros(nk, 3)}
            for et, (sn, dn) in spec.items():
                src_idx, dst_idx = edges[et]
                if src_idx.shape[0] == 0:
                    continue
                m, mx = self._edges_msg(conv, et, h[sn], h[dn], x[sn], x[dn], src_idx, dst_idx)
                agg_h[dn].index_add_(0, dst_idx, m)
                agg_x[dn].index_add_(0, dst_idx, mx)
            for nt in ["lig", "kp"]:
                hn = agg_h[nt] / z[nt]
                xn = agg_x[nt] / z[nt]
                new_h = h[nt] + conv.node_mlp[nt](torch.cat([h[nt], hn], dim=1))
                h[nt] = conv.layer_norm[nt](new_h)
                x[nt] = x[nt] + xn

        eps_h = self.lig_decoder(h["lig"][:, :-1])
        eps_x = x["lig"] - lig_x
        return eps_h, eps_x


def build_edges(lig_x, kp_x):
    """Edge lists exactly as the reference builds them (dynamics.py:387-420):
    ll radius graph, kl = each kp -> its KL_K nearest lig atoms, lk reverse,
    kk radius graph from the encoder."""
    nl, nk = lig_x.shape[0], kp_x.shape[0]
    src_ll, dst_ll = [], []
    for i in range(nl):
        for j in range(nl):
            if i != j and torch.linalg.vector_norm(lig_x[i] - lig_x[j]) < LL_CUT:
                src_ll.append(i)
                dst_ll.append(j)
    src_kl, dst_kl = [], []
    for k in range(nk):
        d = torch.linalg.vector_norm(lig_x - kp_x[k], dim=1)
        nearest = torch.argsort(d)[:KL_K]
        for j in nearest.tolist():
            src_kl.append(k)
            dst_kl.append(j)
    src_kk, dst_kk = [], []
    for i in range(nk):
        for j in range(nk):
            if i != j and torch.linalg.vector_norm(kp_x[i] - kp_x[j]) < KK_CUT:
                src_kk.append(i)
                dst_kk.append(j)
    t = lambda a: torch.tensor(a, dtype=torch.long)
    return {
        "ll": (t(src_ll), t(dst_ll)),
        "kl": (t(src_kl), t(dst_kl)),
        "lk": (t(dst_kl), t(src_kl)),
        "kk": (t(src_kk), t(dst_kk)),
    }


@pytest.mark.slow
@pytest.mark.parametrize("message_norm", [1.0, 0])
def test_dynamics_matches_independent_torch_impl(message_norm):
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    NL, NK = 7, 5
    lig_x = torch.tensor(rng.normal(size=(NL, 3)) * 2, dtype=torch.float32)
    lig_h = torch.tensor(rng.normal(size=(NL, ATOM_NF)), dtype=torch.float32)
    kp_x = torch.tensor(rng.normal(size=(NK, 3)) * 3, dtype=torch.float32)
    kp_h = torch.tensor(rng.normal(size=(NK, REC_NF)), dtype=torch.float32)
    t_val = 0.35

    ref = TorchRefDynamics(message_norm=message_norm)
    edges = build_edges(lig_x, kp_x)
    with torch.no_grad():
        eps_h_t, eps_x_t = ref(lig_x, lig_h, kp_x, kp_h, t_val, edges)

    # ---- our model with converted weights
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params_dyn = convert_egnn_dynamics_state_dict(
        sd, n_layers=N_LAYERS, update_kp_feat=True, rec_nf=REC_NF, hidden_nf=HID
    )

    cfg = DiffusionConfig(
        atom_nf=ATOM_NF, rec_nf=REC_NF, n_timesteps=10, rec_encoder_type="fixed",
        graph_cutoffs={"rr": KK_CUT, "kk": KK_CUT, "kl": 8, "ll": LL_CUT, "rk": 100},
        dynamics=dict(n_layers=N_LAYERS, hidden_nf=HID, use_tanh=True, message_norm=message_norm,
                      update_kp_feat=True, norm=True, ll_k=0, kl_k=KL_K),
    )
    model = KeypointDiffusion(cfg)

    lig_mask = jnp.ones((1, NL), bool)
    kp_mask = jnp.ones((1, NK), bool)
    kk = dense_radius_adjacency(jnp.asarray(kp_x.numpy())[None], kp_mask,
                                jnp.asarray(kp_x.numpy())[None], kp_mask, KK_CUT, exclude_self=True)
    eps_h_j, eps_x_j = model._apply_dynamics(
        {"dynamics": jax.tree_util.tree_map(jnp.asarray, params_dyn)},
        jnp.asarray(lig_x.numpy())[None], jnp.asarray(lig_h.numpy())[None], lig_mask,
        jnp.asarray(kp_x.numpy())[None], jnp.asarray(kp_h.numpy())[None], kp_mask,
        jnp.full((1,), t_val), kk,
    )

    np.testing.assert_allclose(np.asarray(eps_h_j)[0], eps_h_t.numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(eps_x_j)[0], eps_x_t.numpy(), rtol=2e-4, atol=2e-5)

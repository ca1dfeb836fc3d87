"""GVP receptor encoder parity vs an independent torch reimplementation of
ReceptorEncoderGVP semantics (receptor_encoder_gvp.py:15-322), through the
converter."""
import pytest
import numpy as np
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from kpdiff_tpu.models.complex import synthetic_batch
from kpdiff_tpu.models.diffusion import DiffusionConfig, KeypointDiffusion
from kpdiff_tpu.utils.torch_import import convert_gvp_encoder_state_dict
from tests.test_torch_parity_gvp import TGVP, t_norm_no_nan, t_rbf

IN_F = 6
S = 10
V = 3
N_KP = 4
K_CLOSEST = 3
N_RR = 2
N_RK = 2
N_MSG = 2
N_UPD = 1
RR_CUT = 4.0
RK_RBF_DMAX = 100.0  # graph_cutoffs['rk'] in the shipped configs


class TConv(tnn.Module):
    """Torch GVPEdgeConv semantics (gvp.py:170-341)."""

    def __init__(self, use_dst_feats=False, rbf_dmax=RR_CUT):
        super().__init__()
        self.use_dst_feats = use_dst_feats
        self.rbf_dmax = rbf_dmax
        gvps = []
        for j in range(N_MSG):
            vi = V + 1 + (V if (use_dst_feats and j == 0) else 0) if j == 0 else V
            fi = S + 16 + (S if (use_dst_feats and j == 0) else 0) if j == 0 else S
            gvps.append(TGVP(vi, V, fi, S))
        self.edge_message = tnn.Sequential(*gvps)
        self.node_update = tnn.Sequential(*[TGVP(V, V, S, S) for _ in range(N_UPD)])
        self.message_layer_norm = tnn.Module()
        self.message_layer_norm.feat_norm = tnn.LayerNorm(S)
        self.update_layer_norm = tnn.Module()
        self.update_layer_norm.feat_norm = tnn.LayerNorm(S)

    @staticmethod
    def _ln(ln, feats, vectors):
        vn = t_norm_no_nan(vectors, keepdims=True, sqrt=False)
        vn = torch.sqrt(vn.mean(-2, keepdim=True) + 1e-5) + 1e-5
        return ln.feat_norm(feats), vectors / vn

    def forward(self, src, dst, edges, z):
        (hs, xs, vs), (hd, xd, vd) = src, dst
        si, di = edges
        diff = xs[si] - xd[di]
        dij = t_norm_no_nan(diff, keepdims=True) + 1e-8
        x_unit = diff / dij
        vecs = [x_unit[:, None, :], vs[si]]
        scls = [hs[si], t_rbf(dij[:, 0], d_max=self.rbf_dmax)]
        if self.use_dst_feats:
            vecs.append(vd[di])
            scls.append(hd[di])
        ms, mv = self.edge_message((torch.cat(scls, dim=1), torch.cat(vecs, dim=1)))
        n = hd.shape[0]
        ags = torch.zeros(n, S).index_add_(0, di, ms) / z
        agv = torch.zeros(n, V, 3).index_add_(0, di, mv) / z
        h = hd + ags
        v = vd + agv
        h, v = self._ln(self.message_layer_norm, h, v)
        rs, rv = self.node_update((h, v))
        h, v = self._ln(self.update_layer_norm, h + rs, v + rv)
        return h, v


class TorchRefGVPEncoder(tnn.Module):
    def __init__(self):
        super().__init__()
        act = tnn.SiLU
        self.scalar_embed = tnn.Sequential(tnn.Linear(IN_F, S), act(), tnn.Linear(S, S), act())
        self.scalar_norm = tnn.LayerNorm(S)
        self.rr_conv_layers = tnn.ModuleList([TConv(rbf_dmax=RR_CUT) for _ in range(N_RR)])
        self.rk_conv_layers = tnn.ModuleList([TConv(use_dst_feats=i != 0, rbf_dmax=RK_RBF_DMAX) for i in range(N_RK)])
        ki = tnn.Module()
        ki.src_net = tnn.Linear(S, S, bias=False)
        ki.dst_net = tnn.Linear(S, S, bias=False)
        ki.keypoint_embedding = tnn.Sequential(tnn.Linear(S, S * N_KP), act(), tnn.LayerNorm(S * N_KP))
        self.keypoint_initializer = ki

    def forward(self, x0, h0, message_norm=10.0):
        n = x0.shape[0]
        h = self.scalar_norm(self.scalar_embed(h0))
        v = torch.zeros(n, V, 3)

        src, dst = [], []
        for i in range(n):
            for j in range(n):
                if i != j and torch.linalg.vector_norm(x0[i] - x0[j]) < RR_CUT:
                    src.append(i)
                    dst.append(j)
        rr = (torch.tensor(src, dtype=torch.long), torch.tensor(dst, dtype=torch.long))

        for conv in self.rr_conv_layers:
            h, v = conv((h, x0, v), (h, x0, v), rr, message_norm)

        ki = self.keypoint_initializer
        kp_emb = ki.keypoint_embedding(h.mean(0, keepdim=True)).reshape(N_KP, S)
        ft_rec = ki.src_net(h)
        ft_kp = ki.dst_net(kp_emb)
        attn = torch.softmax(ft_kp @ ft_rec.T / S**0.5, dim=1)
        kp_pos = attn @ x0

        kp_h = torch.zeros(N_KP, S)
        kp_v = torch.zeros(N_KP, V, 3)

        # rk knn edges: each kp <- its K_CLOSEST nearest rec atoms
        si, di = [], []
        for k in range(N_KP):
            d = torch.linalg.vector_norm(x0 - kp_pos[k], dim=1)
            for j in torch.argsort(d)[:K_CLOSEST].tolist():
                si.append(j)
                di.append(k)
        rk = (torch.tensor(si, dtype=torch.long), torch.tensor(di, dtype=torch.long))

        for conv in self.rk_conv_layers:
            kp_h, kp_v = conv((h, x0, v), (kp_h, kp_pos, kp_v), rk, message_norm)
        return kp_pos, kp_h, kp_v


@pytest.mark.slow
def test_gvp_encoder_matches_independent_torch_impl():
    torch.manual_seed(5)
    rng = np.random.default_rng(5)
    N = 12
    x0 = torch.tensor(rng.normal(size=(N, 3)) * 2.5, dtype=torch.float32)
    h0 = torch.tensor(rng.normal(size=(N, IN_F)), dtype=torch.float32)

    ref = TorchRefGVPEncoder()
    with torch.no_grad():
        kp_pos_t, kp_h_t, kp_v_t = ref(x0, h0)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    enc_params = convert_gvp_encoder_state_dict(sd, N_RR, N_RK, N_MSG, N_UPD)

    cfg = DiffusionConfig(
        atom_nf=5, rec_nf=S, n_timesteps=10, architecture="gvp", rec_encoder_type="learned",
        graph_cutoffs={"rr": RR_CUT, "rk": RK_RBF_DMAX, "kk": 8, "kl": 8, "ll": 5},
        dynamics=dict(vector_size=V, n_convs=1, n_hidden_scalars=8, kl_k=2,
                      n_message_gvps=1, n_update_gvps=1, n_noise_gvps=2),
        rec_encoder=dict(
            in_scalar_size=IN_F, n_keypoints=N_KP, out_scalar_size=S, vector_size=V,
            n_rr_convs=N_RR, n_rk_convs=N_RK, message_norm=10.0, k_closest=K_CLOSEST,
            kp_rad=0, n_message_gvps=N_MSG, n_update_gvps=N_UPD, dropout=0.0,
        ),
    )
    model = KeypointDiffusion(cfg)
    cpx = synthetic_batch(0, batch=1, n_rec_pad=N, n_lig_pad=6, n_rec_feat=IN_F, n_lig_feat=5,
                          n_kp=N_KP, kp_feat_dim=S, kp_vec_dim=V, min_rec=N, min_lig=6)
    cpx = cpx.replace(rec_x=jnp.asarray(x0.numpy())[None], rec_h=jnp.asarray(h0.numpy())[None])
    enc, _ = model.encode({"encoder": jax.tree_util.tree_map(jnp.asarray, enc_params)}, cpx)

    np.testing.assert_allclose(np.asarray(enc.kp_x)[0], kp_pos_t.numpy(), rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(enc.kp_h)[0], kp_h_t.numpy(), rtol=5e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(enc.kp_v)[0], kp_v_t.numpy(), rtol=5e-4, atol=1e-4)

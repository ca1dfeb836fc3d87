"""Learned EGNN receptor encoder parity vs an independent torch
reimplementation of ReceptorEncoder semantics (receptor_encoder.py:14-555),
through the checkpoint converter."""
import pytest
import numpy as np
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from kpdiff_tpu.models.complex import synthetic_batch
from kpdiff_tpu.models.diffusion import DiffusionConfig, KeypointDiffusion
from kpdiff_tpu.utils.torch_import import convert_egnn_encoder_state_dict

IN_F = 6
HID = 12
N_CONVS = 2
N_KP = 4
K_CLOSEST = 3
RR_CUT = 4.0


class TorchRefEncoder(tnn.Module):
    """Independent torch impl of the reference encoder semantics."""

    def __init__(self, use_sameres=True, fix_pos=False, message_norm=0):
        super().__init__()
        act = tnn.SiLU
        self.use_sameres = use_sameres
        self.fix_pos = fix_pos
        self.message_norm = message_norm
        E = 1 if use_sameres else 0

        class Conv(tnn.Module):
            def __init__(self, f_in):
                super().__init__()
                self.edge_mlp = tnn.Sequential(tnn.Linear(2 * f_in + 1 + E, HID), act(), tnn.Linear(HID, HID), act())
                self.soft_attention = tnn.Sequential(tnn.Linear(HID, 1), tnn.Sigmoid())
                if not fix_pos:
                    self.coord_mlp = tnn.Sequential(tnn.Linear(2 * f_in + 1 + E, HID), act(), tnn.Linear(HID, 1, bias=False))
                self.node_mlp = tnn.Sequential(tnn.Linear(f_in + HID, HID), act(), tnn.Linear(HID, HID))
                self.layer_norm = tnn.LayerNorm(HID)

        self.rec_convs = tnn.ModuleList([Conv(IN_F if i == 0 else HID) for i in range(N_CONVS)])
        self.keypoint_embedding = tnn.Sequential(tnn.Linear(HID, HID * N_KP), act())

        class RecKey(tnn.Module):
            def __init__(self):
                super().__init__()
                self.fc_src = tnn.Linear(HID, HID, bias=False)
                self.fc_dst = tnn.Linear(HID, HID, bias=False)
                self.kp_feature_mlp = tnn.Sequential(tnn.Linear(HID + K_CLOSEST, HID), act())
                self.layer_norm = tnn.LayerNorm(HID)

        self.rec_kp_conv = RecKey()

    def forward(self, x0, h0, res_idx):
        n = x0.shape[0]
        # rr radius edges (< RR_CUT, no self)
        src, dst, same = [], [], []
        for i in range(n):
            for j in range(n):
                if i != j and torch.linalg.vector_norm(x0[i] - x0[j]) < RR_CUT:
                    src.append(i)
                    dst.append(j)
                    same.append(1.0 if res_idx[i] == res_idx[j] else 0.0)
        src = torch.tensor(src)
        dst = torch.tensor(dst)
        same = torch.tensor(same)[:, None]

        z = len(src) / n if self.message_norm == 0 else self.message_norm

        h, x = h0, x0.clone()
        for conv in self.rec_convs:
            diff = x[src] - x[dst]
            dij = torch.linalg.vector_norm(diff, dim=1, keepdim=True)
            x_unit = diff / (dij + 1)
            f = torch.cat([h[src], h[dst], dij] + ([same] if self.use_sameres else []), dim=1)
            m = conv.edge_mlp(f)
            m = m * conv.soft_attention(m)
            agg_h = torch.zeros(n, HID).index_add_(0, dst, m) / z
            # note: encoder node update is NOT residual (receptor_encoder.py:149)
            h = conv.layer_norm(conv.node_mlp(torch.cat([h, agg_h], dim=1)))
            if not self.fix_pos:
                s = conv.coord_mlp(f)
                mx = torch.tanh(s) * x_unit * 10.0
                x = x + torch.zeros(n, 3).index_add_(0, dst, mx) / z

        # keypoint init + attention (fc_src used for queries AND keys)
        kp_emb = self.keypoint_embedding(h.mean(0, keepdim=True)).reshape(N_KP, HID)
        ft_rec = self.rec_kp_conv.fc_src(h)
        ft_kp = self.rec_kp_conv.fc_src(kp_emb)
        logits = ft_kp @ ft_rec.T / HID**0.5
        attn = torch.softmax(logits, dim=1)
        val = x0 if self.fix_pos else x
        kp_pos = attn @ val

        # k_closest feats from ORIGINAL rec positions, evolved features
        feats = []
        for k in range(N_KP):
            d = torch.linalg.vector_norm(x0 - kp_pos[k], dim=1)
            order = torch.argsort(d)[:K_CLOSEST]
            feats.append(torch.cat([h[order].mean(0), torch.sort(d[order]).values]))
        kp_feat = torch.stack(feats)
        kp_feat = self.rec_kp_conv.layer_norm(self.rec_kp_conv.kp_feature_mlp(kp_feat))
        return kp_pos, kp_feat
@pytest.mark.slow


def test_encoder_matches_independent_torch_impl():
    torch.manual_seed(1)
    rng = np.random.default_rng(1)
    N = 14
    x0 = torch.tensor(rng.normal(size=(N, 3)) * 2.5, dtype=torch.float32)
    h0 = torch.tensor(rng.normal(size=(N, IN_F)), dtype=torch.float32)
    res_idx = torch.tensor(rng.integers(0, 4, size=N))

    ref = TorchRefEncoder()
    with torch.no_grad():
        kp_pos_t, kp_feat_t = ref(x0, h0, res_idx)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    enc_params = convert_egnn_encoder_state_dict(
        sd, n_convs=N_CONVS, hidden=HID, out_feat=HID, in_feat=IN_F,
        use_sameres_feat=True, fix_pos=False, norm=True,
    )

    cfg = DiffusionConfig(
        atom_nf=5, rec_nf=HID, n_timesteps=10, rec_encoder_type="learned",
        graph_cutoffs={"rr": RR_CUT, "rk": 100, "kk": 8, "kl": 8, "ll": 5},
        dynamics=dict(n_layers=1, hidden_nf=8, kl_k=2),
        rec_encoder=dict(
            n_keypoints=N_KP, in_n_node_feat=IN_F, hidden_n_node_feat=HID, out_n_node_feat=HID,
            n_convs=N_CONVS, use_tanh=True, message_norm=0, k_closest=K_CLOSEST, kp_rad=0.0,
            norm=True, fix_pos=False, use_sameres_feat=True,
        ),
    )
    model = KeypointDiffusion(cfg)
    cpx = synthetic_batch(0, batch=1, n_rec_pad=N, n_lig_pad=6, n_rec_feat=IN_F, n_lig_feat=5,
                          n_kp=N_KP, kp_feat_dim=HID, min_rec=N, min_lig=6)
    cpx = cpx.replace(
        rec_x=jnp.asarray(x0.numpy())[None],
        rec_h=jnp.asarray(h0.numpy())[None],
        rec_res_idx=jnp.asarray(res_idx.numpy().astype(np.int32))[None],
    )
    enc, _ = model.encode({"encoder": jax.tree_util.tree_map(jnp.asarray, enc_params)}, cpx)

    np.testing.assert_allclose(np.asarray(enc.kp_x)[0], kp_pos_t.numpy(), rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(enc.kp_h)[0], kp_feat_t.numpy(), rtol=5e-4, atol=5e-5)

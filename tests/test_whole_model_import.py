"""Whole-model reference-checkpoint import (VERDICT r2 item 7): a COMPLETE
reference-format state_dict (dynamics + learned receptor encoder, keys
prefixed 'dynamics.' / 'rec_encoder.' as in the reference LigandDiffuser
module tree, models/ligand_diffuser.py) -> convert_reference_checkpoint ->
params that (a) exactly match the flax model's init tree in structure and
shapes and (b) drive encode + sample end-to-end.

Reuses the independent torch reimplementations from the per-module parity
tests (their naming mirrors the reference module paths), with dims aligned
so encoder output width == dynamics kp input width.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import tests.test_torch_parity as tp
import tests.test_torch_parity_encoder as tpe
import tests.test_torch_parity_gvp as tpg
import tests.test_torch_parity_gvp_encoder as tpge
from kpdiff_tpu.models.complex import synthetic_batch
from kpdiff_tpu.models.diffusion import DiffusionConfig, KeypointDiffusion
from kpdiff_tpu.utils.torch_import import convert_reference_checkpoint


def _shapes(tree):
    return {jax.tree_util.keystr(p): tuple(np.shape(l))
            for p, l in jax.tree_util.tree_leaves_with_path(tree)}


def _full_sd(dyn_module, enc_module):
    sd = {f"dynamics.{k}": v.numpy() for k, v in dyn_module.state_dict().items()}
    sd.update({f"rec_encoder.{k}": v.numpy() for k, v in enc_module.state_dict().items()})
    return sd


def test_whole_model_import_egnn_learned():
    torch.manual_seed(0)
    old = tp.REC_NF
    try:
        tp.REC_NF = tpe.HID  # encoder out width feeds the dynamics kp input
        ref_dyn = tp.TorchRefDynamics()
    finally:
        tp.REC_NF = old
    ref_enc = tpe.TorchRefEncoder()
    sd = _full_sd(ref_dyn, ref_enc)

    cfg = DiffusionConfig(
        atom_nf=tp.ATOM_NF, rec_nf=tpe.HID, n_timesteps=10, rec_encoder_type="learned",
        graph_cutoffs={"rr": tpe.RR_CUT, "rk": 100, "kk": 8, "kl": 8, "ll": 5},
        dynamics=dict(n_layers=tp.N_LAYERS, hidden_nf=tp.HID, kl_k=tp.KL_K,
                      update_kp_feat=True, message_norm=1, use_tanh=True, norm=True),
        rec_encoder=dict(
            n_keypoints=tpe.N_KP, in_n_node_feat=tpe.IN_F, hidden_n_node_feat=tpe.HID,
            out_n_node_feat=tpe.HID, n_convs=tpe.N_CONVS, use_tanh=True, message_norm=0,
            k_closest=tpe.K_CLOSEST, kp_rad=0.0, norm=True, fix_pos=False,
            use_sameres_feat=True,
        ),
    )
    model = KeypointDiffusion(cfg)
    cpx = synthetic_batch(0, batch=2, n_rec_pad=14, n_lig_pad=6, n_rec_feat=tpe.IN_F,
                          n_lig_feat=tp.ATOM_NF, n_kp=tpe.N_KP, kp_feat_dim=tpe.HID,
                          min_rec=10, min_lig=4)

    params = convert_reference_checkpoint(sd, model)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    init_params = model.init(jax.random.key(0), cpx)
    assert _shapes(params) == _shapes(init_params)

    enc, kk = model.encode(params, cpx)
    out = model.sample(params, jax.random.key(1), enc, kk, init_com=None)
    assert np.isfinite(np.asarray(out["lig_x"])).all()
    assert np.isfinite(np.asarray(out["lig_h"])).all()


@pytest.mark.slow
def test_whole_model_import_gvp_learned():
    """Exercises the architecture dispatch in convert_reference_checkpoint:
    a GVP model's encoder must convert through the GVP mapping, not be
    overwritten by the EGNN one."""
    torch.manual_seed(0)
    old_kp, old_v = tpg.KP_NF, tpg.V
    try:
        tpg.KP_NF = tpge.S  # encoder scalar width feeds dynamics kp input
        tpg.V = tpge.V      # shared keypoint vector channel count
        ref_dyn = tpg.TorchRefGVPDynamics(update_kp=True)
    finally:
        tpg.KP_NF, tpg.V = old_kp, old_v
    ref_enc = tpge.TorchRefGVPEncoder()
    sd = _full_sd(ref_dyn, ref_enc)

    cfg = DiffusionConfig(
        atom_nf=tpg.ATOM_NF, rec_nf=tpge.S, n_timesteps=10, architecture="gvp",
        rec_encoder_type="learned",
        graph_cutoffs={"rr": tpge.RR_CUT, "rk": tpge.RK_RBF_DMAX, "kk": tpg.KK_CUT,
                       "kl": 8, "ll": tpg.LL_CUT},
        dynamics=dict(vector_size=tpge.V, n_convs=tpg.N_CONVS, n_hidden_scalars=tpg.S,
                      update_kp=True, message_norm=10.0, ll_k=0, kl_k=tpg.KL_K,
                      n_message_gvps=tpg.N_MSG, n_update_gvps=tpg.N_UPD,
                      n_noise_gvps=tpg.N_NOISE),
        rec_encoder=dict(
            in_scalar_size=tpge.IN_F, n_keypoints=tpge.N_KP, out_scalar_size=tpge.S,
            vector_size=tpge.V, n_rr_convs=tpge.N_RR, n_rk_convs=tpge.N_RK,
            message_norm=10.0, k_closest=tpge.K_CLOSEST, kp_rad=0,
            n_message_gvps=tpge.N_MSG, n_update_gvps=tpge.N_UPD, dropout=0.0,
        ),
    )
    model = KeypointDiffusion(cfg)
    cpx = synthetic_batch(0, batch=2, n_rec_pad=12, n_lig_pad=6, n_rec_feat=tpge.IN_F,
                          n_lig_feat=tpg.ATOM_NF, n_kp=tpge.N_KP, kp_feat_dim=tpge.S,
                          kp_vec_dim=tpge.V, min_rec=10, min_lig=4)

    params = convert_reference_checkpoint(sd, model)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    init_params = model.init(jax.random.key(0), cpx)
    assert _shapes(params) == _shapes(init_params)

    enc, kk = model.encode(params, cpx)
    out = model.sample(params, jax.random.key(1), enc, kk, init_com=None)
    assert np.isfinite(np.asarray(out["lig_x"])).all()
    assert np.isfinite(np.asarray(out["lig_h"])).all()

"""MXU-aligned t-channel (models/egnn.py _smatmul): the split path must be
numerically equivalent to the naive hidden_nf+1-wide path — same params,
same inputs, same outputs (up to matmul reassociation)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kpdiff_tpu.models.complex import synthetic_batch
from kpdiff_tpu.models.diffusion import DiffusionConfig, KeypointDiffusion


def mk(mxu_split_t, kk_layout="dense", kl_k=5, ll_k=0, update_kp_feat=True):
    return KeypointDiffusion(DiffusionConfig(
        atom_nf=10, rec_nf=32, n_timesteps=10, architecture="egnn",
        rec_encoder_type="learned",
        graph_cutoffs={"rr": 3.5, "rk": 100, "kk": 8, "kl": 8, "ll": 5},
        dynamics=dict(n_layers=2, hidden_nf=128, use_tanh=True, message_norm=0,
                      update_kp_feat=update_kp_feat, norm=True, ll_k=ll_k, kl_k=kl_k,
                      kk_layout=kk_layout, mxu_split_t=mxu_split_t),
        rec_encoder=dict(n_convs=1, hidden_n_node_feat=32, out_n_node_feat=32,
                         use_tanh=True, message_norm=1, k_closest=3),
        rec_encoder_loss=dict(loss_type="none"),
    ))


@pytest.mark.parametrize("kl_k,ll_k,update_kp_feat,kk_layout", [
    (5, 0, True, "dense"),   # flagship shape: kl pairs + dense ll + dense kk
    (0, 4, True, "nbr"),     # dense kl/lk + knn ll + nbr kk
    (5, 0, False, "dense"),  # no kp updates
])
@pytest.mark.slow
def test_split_t_matches_unsplit(kl_k, ll_k, update_kp_feat, kk_layout):
    m_ref = mk(False, kk_layout, kl_k, ll_k, update_kp_feat)
    m_spl = mk(True, kk_layout, kl_k, ll_k, update_kp_feat)
    cpx = synthetic_batch(17, batch=2, n_rec_pad=32, n_lig_pad=10, n_kp=8,
                          kp_feat_dim=32, min_rec=20)
    params = m_ref.init(jax.random.key(0), cpx)
    enc, kk = m_ref.encode(params, cpx)
    t = jnp.array([0.3, 0.8])

    out_ref = m_ref._apply_dynamics(params, enc.lig_x, enc.lig_h, enc.lig_mask,
                                    enc.kp_x, enc.kp_h, enc.kp_mask, t, kk)
    out_spl = m_spl._apply_dynamics(params, enc.lig_x, enc.lig_h, enc.lig_mask,
                                    enc.kp_x, enc.kp_h, enc.kp_mask, t, kk)
    np.testing.assert_allclose(np.asarray(out_spl[0]), np.asarray(out_ref[0]),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_spl[1]), np.asarray(out_ref[1]),
                               rtol=2e-4, atol=1e-5)


@pytest.mark.slow
def test_split_t_grads_match():
    m_ref = mk(False)
    m_spl = mk(True)
    cpx = synthetic_batch(19, batch=2, n_rec_pad=32, n_lig_pad=10, n_kp=8,
                          kp_feat_dim=32, min_rec=20)
    params = m_ref.init(jax.random.key(0), cpx)
    g_ref = jax.grad(lambda p: m_ref.loss(p, jax.random.key(1), cpx)["l2"])(params)
    g_spl = jax.grad(lambda p: m_spl.loss(p, jax.random.key(1), cpx)["l2"])(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_spl)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-3, atol=2e-5)

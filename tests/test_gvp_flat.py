"""Flat (..., 3V) vector layout must be numerically equivalent to the
(..., V, 3) layout — same params, same inputs, same outputs (up to matmul
reassociation). The flat layout is the TPU-lane-efficient default in the
GVP dynamics (models/gvp.py kron-block helpers)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kpdiff_tpu.models.complex import synthetic_batch
from kpdiff_tpu.models.diffusion import DiffusionConfig, KeypointDiffusion
from kpdiff_tpu.models.gvp import GVP, flatten_vec, unflatten_vec


@pytest.mark.parametrize("gating,act", [(True, "sigmoid"), (False, "identity")])
def test_gvp_primitive_flat_matches_vc(gating, act):
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(6, 8)).astype(np.float32))
    vecs = jnp.asarray(rng.normal(size=(6, 5, 3)).astype(np.float32))
    kw = dict(dim_vectors_in=5, dim_vectors_out=4, dim_feats_in=8, dim_feats_out=7,
              vector_gating=gating, vectors_activation=act)
    m_vc = GVP(**kw)
    m_fl = GVP(**kw, vec_layout="flat")
    params = m_vc.init(jax.random.key(0), (feats, vecs))
    f1, v1 = m_vc.apply(params, (feats, vecs))
    f2, v2 = m_fl.apply(params, (feats, flatten_vec(vecs)))
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(unflatten_vec(v2)), np.asarray(v1), rtol=1e-5, atol=1e-6)


def mk_dyn(vec_layout):
    return KeypointDiffusion(DiffusionConfig(
        atom_nf=10, rec_nf=24, n_timesteps=10, architecture="gvp", rec_encoder_type="learned",
        graph_cutoffs={"rr": 3.5, "rk": 100, "kk": 8, "kl": 8, "ll": 6},
        dynamics=dict(vector_size=4, n_convs=2, n_hidden_scalars=24, update_kp=True,
                      message_norm=0, ll_k=0, kl_k=3, n_message_gvps=2, n_update_gvps=1,
                      n_noise_gvps=2, dropout=0.0, vec_layout=vec_layout),
        rec_encoder=dict(in_scalar_size=10, n_keypoints=5, out_scalar_size=24, vector_size=4,
                         n_rr_convs=1, n_rk_convs=2, message_norm=10, k_closest=3,
                         n_message_gvps=2, n_update_gvps=1, dropout=0.0),
        rec_encoder_loss=dict(loss_type="none"),
    ))


@pytest.mark.slow
def test_gvp_dynamics_flat_matches_vc():
    m_vc = mk_dyn("vc")
    m_fl = mk_dyn("flat")
    cpx = synthetic_batch(23, batch=2, n_rec_pad=32, n_lig_pad=10, n_kp=5,
                          kp_feat_dim=24, kp_vec_dim=4, min_rec=20)
    params = m_vc.init(jax.random.key(0), cpx)
    enc, kk = m_vc.encode(params, cpx)
    t = jnp.array([0.3, 0.8])
    out_vc = m_vc._apply_dynamics(params, enc.lig_x, enc.lig_h, enc.lig_mask,
                                  enc.kp_x, enc.kp_h, enc.kp_mask, t, kk, enc.kp_v)
    out_fl = m_fl._apply_dynamics(params, enc.lig_x, enc.lig_h, enc.lig_mask,
                                  enc.kp_x, enc.kp_h, enc.kp_mask, t, kk, enc.kp_v)
    np.testing.assert_allclose(np.asarray(out_fl[0]), np.asarray(out_vc[0]), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_fl[1]), np.asarray(out_vc[1]), rtol=2e-4, atol=1e-5)


@pytest.mark.slow
def test_gvp_dynamics_flat_grads_match():
    m_vc = mk_dyn("vc")
    m_fl = mk_dyn("flat")
    cpx = synthetic_batch(29, batch=2, n_rec_pad=32, n_lig_pad=10, n_kp=5,
                          kp_feat_dim=24, kp_vec_dim=4, min_rec=20)
    params = m_vc.init(jax.random.key(0), cpx)
    g_vc = jax.grad(lambda p: m_vc.loss(p, jax.random.key(1), cpx)["l2"])(params)
    g_fl = jax.grad(lambda p: m_fl.loss(p, jax.random.key(1), cpx)["l2"])(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_vc), jax.tree_util.tree_leaves(g_fl)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-3, atol=3e-5)


@pytest.mark.slow
def test_gvp_compact_kk_exact():
    """compact_kk's capped neighbor list must reproduce dense-kk sampling
    for the GVP architecture too (update_kp=True routes kk through
    GVPEdgeMessagesNbr)."""
    m = mk_dyn("flat")
    cpx = synthetic_batch(41, batch=2, n_rec_pad=32, n_lig_pad=10, n_kp=5,
                          kp_feat_dim=24, kp_vec_dim=4, min_rec=20)
    params = m.init(jax.random.key(0), cpx)
    enc, kk = m.encode(params, cpx)
    kk_c = m.compact_kk(enc, kk, align=2)  # force a cap < K so the nbr path runs
    out_d = m.sample(params, jax.random.key(1), enc, kk)
    out_c = m.sample(params, jax.random.key(1), enc, kk_c)
    np.testing.assert_allclose(np.asarray(out_c["lig_x"]), np.asarray(out_d["lig_x"]),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_c["lig_h"]), np.asarray(out_d["lig_h"]),
                               rtol=1e-3, atol=1e-3)

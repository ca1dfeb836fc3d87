"""gather_mode='onehot' (one-hot-matmul gathers) must reproduce
gather_mode='take' exactly: the one-hot rows select a single element, so
each output is one exact f32 product (models/egnn.py::_gather_nodes)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kpdiff_tpu.models.complex import synthetic_batch
from kpdiff_tpu.models.diffusion import DiffusionConfig, KeypointDiffusion
from kpdiff_tpu.models.egnn import _gather_nodes


def test_gather_nodes_exact():
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(3, 17, 9)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(3, 17, 3)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 17, size=(3, 5, 4)).astype(np.int32))
    ht, xt = _gather_nodes(h, x, idx, "take")
    ho, xo = _gather_nodes(h, x, idx, "onehot")
    assert np.array_equal(np.asarray(ht), np.asarray(ho))
    assert np.array_equal(np.asarray(xt), np.asarray(xo))


@pytest.mark.parametrize("compute_dtype", ["float32", "bfloat16"])
def test_dynamics_onehot_gather_matches_take(compute_dtype):
    """Full EGNN dynamics (kNN kl/lk pair lists + capped-nbr kk) with
    one-hot gathers == take gathers, through compact_kk sampling edges."""
    def build(nbr_gather):
        cfg = DiffusionConfig(
            atom_nf=10, rec_nf=10, n_timesteps=8, rec_encoder_type="fixed",
            graph_cutoffs={"rr": 3.5, "rk": 100, "kk": 8, "kl": 6, "ll": 6},
            dynamics=dict(n_layers=2, hidden_nf=32, use_tanh=True, message_norm=1,
                          norm=True, kl_k=3, update_kp_feat=True,
                          compute_dtype=compute_dtype, nbr_gather=nbr_gather),
        )
        return KeypointDiffusion(cfg)

    m_take, m_oh = build("take"), build("onehot")
    cpx = synthetic_batch(7, batch=3, n_rec_pad=48, n_lig_pad=10, n_kp=48,
                          kp_feat_dim=10, min_rec=30, min_lig=6, min_sep=1.8)
    params = m_take.init(jax.random.key(0), cpx)

    enc, kk = jax.jit(m_take.encode)(params, cpx)
    kk_c = m_take.compact_kk(enc, kk)
    assert isinstance(kk_c, tuple), "fixed-encoder kk should compact to a nbr list"

    out_t = jax.jit(lambda p, r, e, k: m_take.sample(p, r, e, k))(params, jax.random.key(1), enc, kk_c)
    out_o = jax.jit(lambda p, r, e, k: m_oh.sample(p, r, e, k))(params, jax.random.key(1), enc, kk_c)
    np.testing.assert_allclose(np.asarray(out_t["lig_x"]), np.asarray(out_o["lig_x"]),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(out_t["lig_h"]), np.asarray(out_o["lig_h"]),
                               rtol=0, atol=0)


@pytest.mark.parametrize("compute_dtype", ["float32", "bfloat16"])
def test_gvp_dynamics_onehot_gather_matches_take(compute_dtype):
    """GVP dynamics (flat vectors, kNN kl pairs + capped-nbr kk) with
    one-hot gathers == take gathers."""
    def build(nbr_gather):
        cfg = DiffusionConfig(
            atom_nf=10, rec_nf=12, n_timesteps=8, architecture="gvp",
            rec_encoder_type="fixed",
            graph_cutoffs={"rr": 3.5, "rk": 100, "kk": 8, "kl": 6, "ll": 6},
            dynamics=dict(vector_size=4, n_convs=2, n_hidden_scalars=24,
                          update_kp=True, message_norm=1.0, kl_k=3,
                          n_message_gvps=2, n_update_gvps=1, n_noise_gvps=2,
                          compute_dtype=compute_dtype, nbr_gather=nbr_gather),
        )
        return KeypointDiffusion(cfg)

    m_take, m_oh = build("take"), build("onehot")
    cpx = synthetic_batch(9, batch=2, n_rec_pad=48, n_lig_pad=10, n_kp=48,
                          kp_feat_dim=12, kp_vec_dim=4, min_rec=30, min_lig=6,
                          min_sep=1.8)
    params = m_take.init(jax.random.key(0), cpx)

    enc, kk = jax.jit(m_take.encode)(params, cpx)
    kk_c = m_take.compact_kk(enc, kk)
    assert isinstance(kk_c, tuple)

    out_t = jax.jit(lambda p, r, e, k: m_take.sample(p, r, e, k))(params, jax.random.key(1), enc, kk_c)
    out_o = jax.jit(lambda p, r, e, k: m_oh.sample(p, r, e, k))(params, jax.random.key(1), enc, kk_c)
    np.testing.assert_allclose(np.asarray(out_t["lig_x"]), np.asarray(out_o["lig_x"]), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(out_t["lig_h"]), np.asarray(out_o["lig_h"]), rtol=0, atol=0)


def test_learned_encoders_onehot_gather_matches_take():
    """rr/rk nbr gathers in both learned receptor encoders, one-hot vs
    take, through model.encode."""
    for arch, enc_extra, dyn in [
        ("egnn", dict(in_n_node_feat=10, hidden_n_node_feat=32, out_n_node_feat=32,
                      n_convs=2, use_tanh=True, message_norm=1, k_closest=3,
                      n_keypoints=8),
         dict(n_layers=1, hidden_nf=32, use_tanh=True, message_norm=1, kl_k=3)),
        ("gvp", dict(in_scalar_size=10, out_scalar_size=24, vector_size=4,
                     n_rr_convs=2, n_rk_convs=1, message_norm=1.0, k_closest=3,
                     n_keypoints=8, n_message_gvps=1, n_update_gvps=1, dropout=0.0),
         dict(vector_size=4, n_convs=1, n_hidden_scalars=24, message_norm=1.0,
              kl_k=3, n_message_gvps=1, n_update_gvps=1, n_noise_gvps=1)),
    ]:
        def build(gather):
            enc = dict(enc_extra)
            enc["nbr_gather"] = gather
            cfg = DiffusionConfig(
                atom_nf=10, rec_nf=(32 if arch == "egnn" else 24), n_timesteps=8,
                architecture=arch, rec_encoder_type="learned",
                graph_cutoffs={"rr": 3.5, "rk": 100, "kk": 8, "kl": 6, "ll": 6},
                dynamics=dyn, rec_encoder=enc,
            )
            return KeypointDiffusion(cfg)

        m_t, m_o = build("take"), build("onehot")
        cpx = synthetic_batch(5, batch=2, n_rec_pad=40, n_lig_pad=8, n_kp=8,
                              kp_feat_dim=(32 if arch == "egnn" else 24),
                              kp_vec_dim=(None if arch == "egnn" else 4),
                              min_rec=30, min_lig=5, min_sep=1.8)
        params = m_t.init(jax.random.key(0), cpx)
        enc_t, _ = jax.jit(m_t.encode)(params, cpx)
        enc_o, _ = jax.jit(m_o.encode)(params, cpx)
        np.testing.assert_allclose(np.asarray(enc_t.kp_x), np.asarray(enc_o.kp_x),
                                   rtol=0, atol=0, err_msg=arch)
        np.testing.assert_allclose(np.asarray(enc_t.kp_h), np.asarray(enc_o.kp_h),
                                   rtol=0, atol=0, err_msg=arch)


@pytest.mark.parametrize("compute_dtype", ["float32", "bfloat16"])
def test_dynamics_proj_gather_close_to_take(compute_dtype):
    """gather_mode='proj' (project-before-gather: onehot @ (h@W) ==
    (onehot@h) @ W) is exact math; values may differ from 'take' only by
    matmul tiling/reassociation rounding, so assert tight allclose over a
    full sampling chain rather than bitwise."""
    def build(nbr_gather):
        cfg = DiffusionConfig(
            atom_nf=10, rec_nf=10, n_timesteps=8, rec_encoder_type="fixed",
            graph_cutoffs={"rr": 3.5, "rk": 100, "kk": 8, "kl": 6, "ll": 6},
            dynamics=dict(n_layers=2, hidden_nf=32, use_tanh=True, message_norm=1,
                          norm=True, kl_k=3, update_kp_feat=True,
                          compute_dtype=compute_dtype, nbr_gather=nbr_gather),
        )
        return KeypointDiffusion(cfg)

    m_take, m_proj = build("take"), build("proj")
    cpx = synthetic_batch(7, batch=3, n_rec_pad=48, n_lig_pad=10, n_kp=48,
                          kp_feat_dim=10, min_rec=30, min_lig=6, min_sep=1.8)
    params = m_take.init(jax.random.key(0), cpx)

    enc, kk = jax.jit(m_take.encode)(params, cpx)
    kk_c = m_take.compact_kk(enc, kk)
    assert isinstance(kk_c, tuple)

    out_t = jax.jit(lambda p, r, e, k: m_take.sample(p, r, e, k))(params, jax.random.key(1), enc, kk_c)
    out_p = jax.jit(lambda p, r, e, k: m_proj.sample(p, r, e, k))(params, jax.random.key(1), enc, kk_c)
    tol = 1e-5 if compute_dtype == "float32" else 5e-2
    np.testing.assert_allclose(np.asarray(out_t["lig_x"]), np.asarray(out_p["lig_x"]),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(out_t["lig_h"]), np.asarray(out_p["lig_h"]),
                               rtol=tol, atol=tol)


def test_precast_pair_params_bitwise():
    """precast_pair_params (the scan weight-cast hoist) must be bitwise
    invisible: every pre-cast leaf is consumed via .astype(compute_dtype)
    anyway. Checked through the full EGNN dynamics at bf16."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from kpdiff_tpu.models.dynamics_egnn import EGNNDynamics, precast_pair_params

    rng = np.random.default_rng(5)
    b, nl, k, F = 2, 6, 5, 7
    dyn = EGNNDynamics(atom_nf=F, rec_nf=9, n_layers=2, hidden_nf=16,
                       use_tanh=True, update_kp_feat=True, kl_k=2,
                       compute_dtype="bfloat16", nbr_gather="onehot")
    args = (
        jnp.asarray(rng.normal(size=(b, nl, 3)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, nl, F)), jnp.float32),
        jnp.ones((b, nl), bool),
        jnp.asarray(rng.normal(size=(b, k, 3)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, k, 9)), jnp.float32),
        jnp.ones((b, k), bool),
        jnp.asarray([0.25, 0.5], jnp.float32),
        jnp.ones((b, k, k), bool),
    )
    params = dyn.init(jax.random.key(0), *args)["params"]
    eps_h0, eps_x0 = jax.jit(lambda p: dyn.apply({"params": p}, *args))(params)
    pc = precast_pair_params(params, "bfloat16")
    # the cast actually moved something
    leaves = jax.tree_util.tree_leaves(pc)
    assert any(l.dtype == jnp.bfloat16 for l in leaves)
    eps_h1, eps_x1 = jax.jit(lambda p: dyn.apply({"params": p}, *args))(pc)
    np.testing.assert_array_equal(np.asarray(eps_h0), np.asarray(eps_h1))
    np.testing.assert_array_equal(np.asarray(eps_x0), np.asarray(eps_x1))

"""Fused Pallas EGNN edge kernel must match the XLA path bit-for-bit-ish
(same math, interpret mode on CPU)."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from kpdiff_tpu.models.egnn import EGNNEdgeDense


def test_pallas_matches_xla_dense_edge():
    rng = np.random.default_rng(0)
    B, Ns, Nd, F = 3, 12, 10, 32
    h_src = jnp.asarray(rng.normal(size=(B, Ns, F)).astype(np.float32))
    h_dst = jnp.asarray(rng.normal(size=(B, Nd, F)).astype(np.float32))
    x_src = jnp.asarray(rng.normal(size=(B, Ns, 3)).astype(np.float32) * 3)
    x_dst = jnp.asarray(rng.normal(size=(B, Nd, 3)).astype(np.float32) * 3)
    adj = jnp.asarray(rng.random((B, Ns, Nd)) < 0.4)

    kwargs = dict(hidden_size=F, use_tanh=True, coords_range=10.0, coord_hidden_layers=2)
    mod_x = EGNNEdgeDense(**kwargs, use_pallas=False)
    mod_p = EGNNEdgeDense(**kwargs, use_pallas=True)

    params = mod_x.init(jax.random.key(0), h_src, h_dst, x_src, x_dst, adj)
    # identical param trees between the two paths
    px = jax.tree_util.tree_structure(params)
    pp = jax.tree_util.tree_structure(mod_p.init(jax.random.key(0), h_src, h_dst, x_src, x_dst, adj))
    assert px == pp

    out_x = mod_x.apply(params, h_src, h_dst, x_src, x_dst, adj)
    out_p = mod_p.apply(params, h_src, h_dst, x_src, x_dst, adj)
    np.testing.assert_allclose(np.asarray(out_p[0]), np.asarray(out_x[0]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p[1]), np.asarray(out_x[1]), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_pallas_dynamics_end_to_end():
    from kpdiff_tpu.models.complex import synthetic_batch
    from kpdiff_tpu.models.diffusion import DiffusionConfig, KeypointDiffusion

    def mk(pallas):
        cfg = DiffusionConfig(
            atom_nf=10, rec_nf=10, n_timesteps=5, precision=1e-5, rec_encoder_type="fixed",
            dynamics=dict(n_layers=2, hidden_nf=16, use_tanh=True, message_norm=0,
                          update_kp_feat=True, norm=True, kl_k=3,
                          use_pallas_sampling=pallas),
        )
        return KeypointDiffusion(cfg)

    m0, m1 = mk(False), mk(True)
    cpx = synthetic_batch(0, batch=2, n_rec_pad=16, n_lig_pad=8, n_kp=16, kp_feat_dim=10, min_rec=10)
    params = m0.init(jax.random.key(0), cpx)
    enc, kk = m0.encode(params, cpx)
    out0 = m0.sample(params, jax.random.key(1), enc, kk)
    out1 = m1.sample(params, jax.random.key(1), enc, kk)
    np.testing.assert_allclose(np.asarray(out1["lig_x"]), np.asarray(out0["lig_x"]), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out1["lig_h"]), np.asarray(out0["lig_h"]), rtol=1e-3, atol=1e-3)

"""bf16 mixed-precision pair MLPs must track f32 within bf16 tolerance."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from kpdiff_tpu.models.complex import synthetic_batch
from kpdiff_tpu.models.diffusion import DiffusionConfig, KeypointDiffusion


def mk(dtype):
    cfg = DiffusionConfig(
        atom_nf=10, rec_nf=10, n_timesteps=20, precision=1e-5, rec_encoder_type="fixed",
        dynamics=dict(n_layers=2, hidden_nf=32, use_tanh=True, message_norm=0,
                      update_kp_feat=True, norm=True, kl_k=3, compute_dtype=dtype),
    )
    return KeypointDiffusion(cfg)


@pytest.mark.slow
def test_bf16_matches_f32_closely():
    m32 = mk("float32")
    m16 = mk("bfloat16")
    cpx = synthetic_batch(0, batch=2, n_rec_pad=24, n_lig_pad=10, n_kp=24, kp_feat_dim=10, min_rec=16)
    params = m32.init(jax.random.key(0), cpx)  # same param tree for both
    enc, kk = m32.encode(params, cpx)
    t = jnp.full((2,), 0.5)
    o32 = m32._apply_dynamics(params, enc.lig_x, enc.lig_h, enc.lig_mask, enc.kp_x, enc.kp_h, enc.kp_mask, t, kk)
    o16 = m16._apply_dynamics(params, enc.lig_x, enc.lig_h, enc.lig_mask, enc.kp_x, enc.kp_h, enc.kp_mask, t, kk)
    # outputs stay f32 dtype and are close in value
    assert o16[0].dtype == jnp.float32
    scale = float(jnp.abs(o32[0]).max())
    np.testing.assert_allclose(np.asarray(o16[0]), np.asarray(o32[0]), atol=0.05 * scale + 1e-3)
    np.testing.assert_allclose(np.asarray(o16[1]), np.asarray(o32[1]), atol=0.05 * float(jnp.abs(o32[1]).max()) + 1e-3)


@pytest.mark.slow
def test_bf16_grads_finite():
    m16 = mk("bfloat16")
    cpx = synthetic_batch(1, batch=2, n_rec_pad=24, n_lig_pad=10, n_kp=24, kp_feat_dim=10, min_rec=16)
    params = m16.init(jax.random.key(1), cpx)
    g = jax.grad(lambda p: m16.loss(p, jax.random.key(2), cpx)["l2"])(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    assert all(x.dtype == jnp.float32 for x in leaves)  # master grads stay f32

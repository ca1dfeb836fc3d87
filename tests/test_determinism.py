"""Determinism: same seed -> bitwise-identical loss, gradients, and samples.

The reference author fought scatter nondeterminism (ligand_diffuser.py:
563-577 'scatter is not deterministic, but segment_csr is!'); our design
has NO scatters in the hot path — aggregations are axis reductions — so
determinism holds by construction. This test pins it.
"""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from kpdiff_tpu.models.complex import synthetic_batch
from kpdiff_tpu.models.diffusion import DiffusionConfig, KeypointDiffusion


def mk():
    cfg = DiffusionConfig(
        atom_nf=10, rec_nf=10, n_timesteps=10, rec_encoder_type="fixed",
        dynamics=dict(n_layers=2, hidden_nf=16, use_tanh=True, message_norm=0,
                      update_kp_feat=True, norm=True, kl_k=3),
    )
    return KeypointDiffusion(cfg)


@pytest.mark.slow
def test_loss_and_grads_bitwise_deterministic():
    model = mk()
    cpx = synthetic_batch(0, batch=2, n_rec_pad=20, n_lig_pad=8, n_kp=20, kp_feat_dim=10)
    params = model.init(jax.random.key(0), cpx)

    f = jax.jit(lambda p, r: model.loss(p, r, cpx)["l2"])
    a = float(f(params, jax.random.key(1)))
    b = float(f(params, jax.random.key(1)))
    assert a == b

    g = jax.jit(jax.grad(lambda p: model.loss(p, jax.random.key(2), cpx)["l2"]))
    g1 = jax.tree_util.tree_leaves(g(params))
    g2 = jax.tree_util.tree_leaves(g(params))
    for x, y in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_sampling_bitwise_deterministic():
    model = mk()
    cpx = synthetic_batch(1, batch=2, n_rec_pad=20, n_lig_pad=8, n_kp=20, kp_feat_dim=10)
    params = model.init(jax.random.key(0), cpx)
    enc, kk = model.encode(params, cpx)
    f = jax.jit(lambda p, r: model.sample(p, r, enc, kk)["lig_x"])
    x1 = np.asarray(f(params, jax.random.key(7)))
    x2 = np.asarray(f(params, jax.random.key(7)))
    np.testing.assert_array_equal(x1, x2)

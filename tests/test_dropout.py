"""GVP dropout is active in the training loss path (GVP configs specify
dropout 0.1-0.2; the reference never eval-modes its modules)."""
import pytest
import numpy as np
import jax

from kpdiff_tpu.models.complex import synthetic_batch
from kpdiff_tpu.models.diffusion import DiffusionConfig, KeypointDiffusion


def mk(dropout):
    return KeypointDiffusion(DiffusionConfig(
        atom_nf=10, rec_nf=16, n_timesteps=10, architecture="gvp", rec_encoder_type="learned",
        graph_cutoffs={"rr": 3.5, "rk": 100, "kk": 8, "kl": 8, "ll": 6},
        dynamics=dict(vector_size=4, n_convs=1, n_hidden_scalars=16, update_kp=False, message_norm="mean",
                      kl_k=2, n_message_gvps=1, n_update_gvps=1, n_noise_gvps=2, dropout=dropout),
        rec_encoder=dict(in_scalar_size=10, n_keypoints=4, out_scalar_size=16, vector_size=4,
                         n_rr_convs=1, n_rk_convs=1, message_norm="mean", k_closest=2,
                         n_message_gvps=1, n_update_gvps=1, dropout=dropout),
        rec_encoder_loss=dict(loss_type="none"),
    ))


@pytest.mark.slow
def test_dropout_active_and_seeded():
    m = mk(0.3)
    cpx = synthetic_batch(0, batch=2, n_rec_pad=16, n_lig_pad=8, n_kp=4, kp_feat_dim=16, kp_vec_dim=4, min_rec=12)
    params = m.init(jax.random.key(0), cpx)

    l1 = float(m.loss(params, jax.random.key(1), cpx)["l2"])
    l1b = float(m.loss(params, jax.random.key(1), cpx)["l2"])
    l2 = float(m.loss(params, jax.random.key(2), cpx)["l2"])
    assert l1 == l1b  # deterministic given the rng
    assert l1 != l2  # rng actually drives the dropout masks (and t/eps)

    # dropout=0 model: same architecture, loss finite, no dropout rng needed
    m0 = mk(0.0)
    p0 = m0.init(jax.random.key(0), cpx)
    assert np.isfinite(float(m0.loss(p0, jax.random.key(1), cpx)["l2"]))

    # sampling stays deterministic-mode (no dropout) and finite
    enc, kk = m.encode(params, cpx)
    out = m.sample(params, jax.random.key(3), enc, kk)
    assert np.all(np.isfinite(np.asarray(out["lig_x"])))


@pytest.mark.slow
def test_dropout_grads_finite():
    m = mk(0.2)
    cpx = synthetic_batch(1, batch=2, n_rec_pad=16, n_lig_pad=8, n_kp=4, kp_feat_dim=16, kp_vec_dim=4, min_rec=12)
    params = m.init(jax.random.key(0), cpx)
    g = jax.grad(lambda p: m.loss(p, jax.random.key(4), cpx)["l2"])(params)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree_util.tree_leaves(g))

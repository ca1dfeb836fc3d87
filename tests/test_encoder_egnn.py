"""Learned EGNN receptor encoder: shapes, equivariance of keypoints,
OT-loss training integration (egnn_20kp-style config)."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from kpdiff_tpu.models.complex import synthetic_batch
from kpdiff_tpu.models.diffusion import DiffusionConfig, KeypointDiffusion


def kp_model(message_norm=0, k_closest=3, kp_rad=0.0, use_sameres=True, fix_pos=False):
    cfg = DiffusionConfig(
        atom_nf=10,
        rec_nf=32,
        n_timesteps=20,
        precision=1e-5,
        rec_encoder_type="learned",
        architecture="egnn",
        graph_cutoffs={"rr": 3.5, "rk": 100, "kk": 8, "kl": 8, "ll": 9},
        dynamics=dict(n_layers=2, hidden_nf=32, use_tanh=False, message_norm=1, kl_k=3),
        rec_encoder=dict(
            n_keypoints=6,
            in_n_node_feat=10,
            hidden_n_node_feat=32,
            out_n_node_feat=32,
            n_convs=2,
            use_tanh=True,
            message_norm=message_norm,
            k_closest=k_closest,
            kp_rad=kp_rad,
            norm=True,
            fix_pos=fix_pos,
            use_sameres_feat=use_sameres,
        ),
        rec_encoder_loss=dict(loss_type="optimal_transport", use_interface_points=True, method="sinkhorn"),
    )
    return KeypointDiffusion(cfg)


def rotation():
    rng = np.random.default_rng(5)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return jnp.asarray(q.astype(np.float32))


@pytest.mark.slow
def test_encoder_shapes_and_masks():
    model = kp_model()
    cpx = synthetic_batch(0, batch=2, n_rec_pad=48, n_lig_pad=12, n_kp=6, kp_feat_dim=32, min_rec=24)
    params = model.init(jax.random.key(0), cpx)
    enc, kk = model.encode(params, cpx)
    assert enc.kp_x.shape == (2, 6, 3)
    assert enc.kp_h.shape == (2, 6, 32)
    assert bool(jnp.all(enc.kp_mask))
    assert np.all(np.isfinite(np.asarray(enc.kp_x)))
    # keypoints land inside the pocket's bounding sphere (attention is a
    # convex combination of pocket atom positions)
    for b in range(2):
        rec = np.asarray(cpx.rec_x[b][np.asarray(cpx.rec_mask[b])])
        lo, hi = rec.min(0) - 1e-3, rec.max(0) + 1e-3
        kp = np.asarray(enc.kp_x[b])
        assert (kp >= lo).all() and (kp <= hi).all()


@pytest.mark.slow
def test_encoder_equivariance():
    model = kp_model(use_sameres=True)
    cpx = synthetic_batch(1, batch=2, n_rec_pad=40, n_lig_pad=10, n_kp=6, kp_feat_dim=32, min_rec=24)
    params = model.init(jax.random.key(1), cpx)
    enc, _ = model.encode(params, cpx)

    R = rotation()
    shift = jnp.array([2.0, -1.0, 3.0])
    cpx_rot = cpx.replace(
        rec_x=(cpx.rec_x @ R.T + shift) * cpx.rec_mask[..., None],
        lig_x=(cpx.lig_x @ R.T + shift) * cpx.lig_mask[..., None],
    )
    enc_rot, _ = model.encode(params, cpx_rot)

    np.testing.assert_allclose(
        np.asarray(enc_rot.kp_x), np.asarray(enc.kp_x @ R.T + shift), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(np.asarray(enc_rot.kp_h), np.asarray(enc.kp_h), rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_kp_rad_variant():
    model = kp_model(k_closest=0, kp_rad=6.0, message_norm=2)
    cpx = synthetic_batch(2, batch=2, n_rec_pad=40, n_lig_pad=10, n_kp=6, kp_feat_dim=32, min_rec=24)
    params = model.init(jax.random.key(2), cpx)
    enc, _ = model.encode(params, cpx)
    assert np.all(np.isfinite(np.asarray(enc.kp_h)))


@pytest.mark.slow
def test_loss_with_ot_and_grads():
    model = kp_model()
    cpx = synthetic_batch(3, batch=2, n_rec_pad=40, n_lig_pad=10, n_kp=6, kp_feat_dim=32, min_rec=24)
    params = model.init(jax.random.key(3), cpx)
    losses = jax.jit(model.loss)(params, jax.random.key(4), cpx)
    assert float(losses["rec_encoder"]) > 0

    def total(p):
        l = model.loss(p, jax.random.key(4), cpx)
        return l["l2"] + 0.1 * l["rec_encoder"]

    g = jax.grad(total)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    # the encoder attention weights must receive gradient through the OT cost
    enc_leaves = jax.tree_util.tree_leaves(g["encoder"])
    assert any(float(jnp.abs(x).max()) > 0 for x in enc_leaves)

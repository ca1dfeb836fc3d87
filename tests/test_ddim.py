"""Generalized-DDIM sampler (models/diffusion.py sample(eta=...)).

Three properties pin the math down:
  1. eta=1.0 takes the reference's ancestral branch verbatim — bitwise
     equal to the default call (the knob cannot perturb reference parity).
  2. The posterior-mean identity the docstring claims:
     alpha_s*x_hat + sqrt(sigma_s^2 - sigma_q^2)*eps == the DDPM ancestral
     mean (ligand_diffuser.py:497-538 algebra) for any (t, s) pair.
  3. eta=0 (deterministic DDIM) composes EXACTLY under striding: with the
     dynamics stubbed to a constant epsilon the K=1, K=7 and K=T chains
     land on the same z_0 — the property that makes eta=0 the right
     companion to --sample_steps.
"""
import numpy as np

import jax
import jax.numpy as jnp

from kpdiff_tpu.models.complex import synthetic_batch
from kpdiff_tpu.models.diffusion import DiffusionConfig, KeypointDiffusion
from kpdiff_tpu.ops.schedule import (
    alpha_from_gamma,
    sigma_and_alpha_t_given_s,
    sigma_from_gamma,
)


def _tiny_model(T=12):
    return KeypointDiffusion(DiffusionConfig(
        atom_nf=10, rec_nf=10, n_timesteps=T, rec_encoder_type="fixed",
        dynamics=dict(n_layers=1, hidden_nf=16, use_tanh=True, message_norm=1, kl_k=3),
    ))


def test_eta_one_is_bitwise_default():
    model = _tiny_model()
    cpx = synthetic_batch(5, batch=2, n_rec_pad=16, n_lig_pad=8, n_kp=16,
                          kp_feat_dim=10, min_rec=10)
    params = model.init(jax.random.key(0), cpx)
    enc, kk = model.encode(params, cpx)

    ref = model.sample(params, jax.random.key(1), enc, kk)
    same = model.sample(params, jax.random.key(1), enc, kk, eta=1.0)
    np.testing.assert_array_equal(np.asarray(ref["lig_x"]), np.asarray(same["lig_x"]))
    np.testing.assert_array_equal(np.asarray(ref["lig_h"]), np.asarray(same["lig_h"]))


def test_eta_one_identity_matches_ancestral_mean():
    """alpha_s*x_hat + sqrt(sigma_s^2 - sigma_q^2)*eps == mu_ancestral."""
    model = _tiny_model(T=1000)
    sched = model.schedule
    rng = np.random.default_rng(3)
    for (t_i, s_i) in [(1000, 999), (617, 401), (50, 0), (1000, 0)]:
        g_t = sched.gamma(jnp.array([t_i / 1000.0]))
        g_s = sched.gamma(jnp.array([s_i / 1000.0]))
        sigma2_ts, sigma_ts, alpha_ts = sigma_and_alpha_t_given_s(g_t, g_s)
        sigma_t, sigma_s = sigma_from_gamma(g_t), sigma_from_gamma(g_s)
        alpha_t, alpha_s = alpha_from_gamma(g_t), alpha_from_gamma(g_s)

        z = jnp.asarray(rng.normal(size=(7,)).astype(np.float32))
        eps = jnp.asarray(rng.normal(size=(7,)).astype(np.float32))

        mu_anc = z / alpha_ts - (sigma2_ts / alpha_ts / sigma_t) * eps

        sigma_q = sigma_ts * sigma_s / sigma_t
        x_hat = (z - sigma_t * eps) / alpha_t
        dir_coef = jnp.sqrt(jnp.maximum(sigma_s**2 - sigma_q**2, 0.0))
        mu_ddim = alpha_s * x_hat + dir_coef * eps

        np.testing.assert_allclose(np.asarray(mu_ddim), np.asarray(mu_anc),
                                   rtol=5e-4, atol=5e-6)


def _stub_constant_eps(model, eps_x_scale, eps_h):
    """Constant-in-z epsilon stub. eps_x must live in the zero-COM subspace
    (as the real equivariant dynamics' position output does, matching the
    model's per-step COM recentering): a nonzero-COM eps_x component is
    removed by the recenter each step, which breaks constant-eps exact
    integration for any sampler. eps_h is plain constant (h has no COM)."""

    def stub(params, lig_x, lig_h, lig_mask, kp_x, kp_h, kp_mask, t, kk,
             kp_v=None, sampling=False):
        n = lig_x.shape[1]
        pat = jnp.stack([jnp.arange(n, dtype=jnp.float32) * s for s in (1.0, -0.5, 0.25)], axis=-1)
        pat = (pat - pat.mean(axis=0, keepdims=True)) * eps_x_scale  # zero-COM
        return (
            jnp.full_like(lig_h, eps_h) * lig_mask[..., None],
            jnp.broadcast_to(pat, lig_x.shape) * lig_mask[..., None],
        )

    model._apply_dynamics = stub


def test_ddim_composes_exactly_under_striding():
    """With eps(z, t) constant the eta=0 update is exact integration: the
    state stays on {alpha*x0 + sigma*c}, so ANY timestep grid lands on the
    same z_0. (The ancestral chain does not have this property — striding
    it changes the law — which is exactly why eta=0 pairs with K<T.)"""
    T = 24
    model = _tiny_model(T=T)
    _stub_constant_eps(model, eps_x_scale=0.1, eps_h=-0.2)
    cpx = synthetic_batch(2, batch=2, n_rec_pad=16, n_lig_pad=8, n_kp=16,
                          kp_feat_dim=10, min_rec=10, min_lig=8)
    enc, kk = model.encode({}, cpx)

    outs = [model.sample({}, jax.random.key(1), enc, kk, sample_steps=K, eta=0.0)
            for K in (1, 7, T)]
    for other in outs[1:]:
        np.testing.assert_allclose(np.asarray(outs[0]["lig_h"]),
                                   np.asarray(other["lig_h"]), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(outs[0]["lig_x"]),
                                   np.asarray(other["lig_x"]), rtol=2e-4, atol=2e-5)


def test_intermediate_eta_runs_masked_and_distinct():
    model = _tiny_model()
    cpx = synthetic_batch(5, batch=2, n_rec_pad=16, n_lig_pad=8, n_kp=16,
                          kp_feat_dim=10, min_rec=10)
    params = model.init(jax.random.key(0), cpx)
    enc, kk = model.encode(params, cpx)

    anc = model.sample(params, jax.random.key(1), enc, kk)
    mid = model.sample(params, jax.random.key(1), enc, kk, eta=0.5)
    det = model.sample(params, jax.random.key(1), enc, kk, eta=0.0)

    for out in (mid, det):
        x = np.asarray(out["lig_x"])
        assert np.all(np.isfinite(x))
        pad_rows = ~np.asarray(enc.lig_mask)
        assert np.all(x[pad_rows] == 0.0)
    assert not np.allclose(np.asarray(mid["lig_x"]), np.asarray(anc["lig_x"]))
    assert not np.allclose(np.asarray(det["lig_x"]), np.asarray(mid["lig_x"]))

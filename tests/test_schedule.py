"""Golden-value and invariant tests for the DDPM schedule algebra.

Cross-checks against an independent torch implementation of the same
published formulas (DiffSBDD / EDM conventions; reference
models/ligand_diffuser.py:232-252,600-690).
"""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from kpdiff_tpu.ops.schedule import (
    NoiseSchedule,
    polynomial_schedule,
    cosine_beta_schedule,
    sigma_from_gamma,
    alpha_from_gamma,
    sigma_and_alpha_t_given_s,
)


def test_polynomial_schedule_endpoints_and_monotonic():
    T = 1000
    a2 = polynomial_schedule(T, s=1e-5, power=2.0)
    assert a2.shape == (T + 1,)
    # squeezed into [s, 1-s]
    assert abs(a2[0] - (1 - 1e-5)) < 1e-9
    assert a2[-1] >= 1e-5 - 1e-12
    # alpha^2 monotonically decreasing
    assert np.all(np.diff(a2) <= 0)


def test_cosine_schedule_basic():
    a2 = cosine_beta_schedule(1000)
    assert a2.shape == (1001,)  # T+1 grid points, like the polynomial schedule
    assert np.all(a2 > 0) and np.all(a2 <= 1)
    assert np.all(np.diff(a2) < 1e-12)


def test_gamma_table_matches_independent_torch():
    T = 1000
    prec = 1e-5
    sched = NoiseSchedule.create("polynomial_2", T, prec)

    # independent torch recomputation from the published formula
    steps = T + 1
    x = torch.linspace(0, steps, steps, dtype=torch.float64)
    # torch.linspace(0, steps, steps) == np.linspace(0, steps, steps)
    a2 = (1 - (x / steps) ** 2.0) ** 2
    a2 = torch.cat([torch.ones(1, dtype=torch.float64), a2])
    ratio = torch.clamp(a2[1:] / a2[:-1], min=0.001, max=1.0)
    a2 = torch.cumprod(ratio, 0)
    a2 = (1 - 2 * prec) * a2 + prec
    gamma_ref = torch.log((1 - a2) / a2)

    np.testing.assert_allclose(sched.gamma_table, gamma_ref.numpy(), rtol=2e-5, atol=1e-5)


def test_gamma_lookup_rounding():
    T = 1000
    sched = NoiseSchedule.create("polynomial_2", T, 1e-5)
    t = jnp.array([0.0, 0.5, 1.0, 0.0004, 0.0006])
    g = sched.gamma(t)
    assert float(g[0]) == float(sched.gamma_table[0])
    assert float(g[1]) == float(sched.gamma_table[500])
    assert float(g[2]) == float(sched.gamma_table[1000])
    # round(0.4)=0, round(0.6)=1
    assert float(g[3]) == float(sched.gamma_table[0])
    assert float(g[4]) == float(sched.gamma_table[1])


def test_alpha_sigma_identity():
    sched = NoiseSchedule.create("polynomial_2", 1000, 1e-5)
    g = jnp.asarray(sched.gamma_table)
    a = alpha_from_gamma(g)
    s = sigma_from_gamma(g)
    np.testing.assert_allclose(np.asarray(a**2 + s**2), 1.0, atol=1e-5)


def test_transition_algebra_vs_torch():
    sched = NoiseSchedule.create("polynomial_2", 1000, 1e-5)
    t = jnp.linspace(1 / 1000, 1.0, 17)
    s = t - 1 / 1000
    g_t, g_s = sched.gamma(t), sched.gamma(s)
    s2, s_ts, a_ts = sigma_and_alpha_t_given_s(g_t, g_s)

    gt = torch.tensor(np.asarray(g_t))
    gs = torch.tensor(np.asarray(g_s))
    s2_ref = -torch.expm1(F.softplus(gs) - F.softplus(gt))
    a_ts_ref = torch.exp(0.5 * (F.logsigmoid(-gt) - F.logsigmoid(-gs)))
    # f32 cancellation in softplus(gs)-softplus(gt) limits agreement to ~0.5%
    np.testing.assert_allclose(np.asarray(s2), s2_ref.numpy(), rtol=5e-3, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s_ts), np.sqrt(s2_ref.numpy()), rtol=5e-3, atol=1e-7)
    np.testing.assert_allclose(np.asarray(a_ts), a_ts_ref.numpy(), rtol=1e-5, atol=1e-7)

    # consistency: alpha_{t|s} = alpha_t / alpha_s, sigma2_{t|s} = sigma_t^2 - a_{t|s}^2 sigma_s^2
    a_t, a_s = alpha_from_gamma(g_t), alpha_from_gamma(g_s)
    np.testing.assert_allclose(np.asarray(a_ts), np.asarray(a_t / a_s), rtol=1e-4)
    sig_t, sig_s = sigma_from_gamma(g_t), sigma_from_gamma(g_s)
    # same cancellation issue near t=0: difference of nearly equal f32 numbers
    np.testing.assert_allclose(
        np.asarray(s2), np.asarray(sig_t**2 - (a_ts**2) * sig_s**2), rtol=5e-2, atol=1e-5
    )


def test_noise_schedule_config_selectable():
    """diffusion.noise_schedule flows from YAML config into the model
    (reference builds PredefinedNoiseSchedule(noise_schedule, ...) from
    config — ligand_diffuser.py:55,654-690). Previously hardcoded."""
    from kpdiff_tpu.config import model_from_config

    base = {
        "dataset": {"rec_elements": ["C", "N", "O"], "lig_elements": ["C", "N", "O"],
                    "max_fake_atom_frac": 0.0},
        "graph": {"n_keypoints": 4, "graph_cutoffs": {"rr": 3.5, "rk": 100, "kk": 8, "kl": 8, "ll": 5}},
        "rec_encoder": {"n_convs": 1, "hidden_n_node_feat": 8, "out_n_node_feat": 8,
                        "message_norm": 1, "k_closest": 2},
        "diffusion": {"n_timesteps": 25, "precision": 1e-5, "architecture": "egnn",
                      "rec_encoder_type": "learned", "noise_schedule": "cosine"},
        "dynamics": {"n_layers": 1, "hidden_nf": 8, "message_norm": 1, "kl_k": 2},
        "rec_encoder_loss": {"loss_type": "none"},
    }
    m_cos = model_from_config(base)
    golden = NoiseSchedule.create("cosine", 25, 1e-5)
    np.testing.assert_array_equal(np.asarray(m_cos.schedule.gamma_table),
                                  np.asarray(golden.gamma_table))

    base["diffusion"]["noise_schedule"] = "polynomial_2"
    m_poly = model_from_config(base)
    poly = NoiseSchedule.create("polynomial_2", 25, 1e-5)
    np.testing.assert_array_equal(np.asarray(m_poly.schedule.gamma_table),
                                  np.asarray(poly.gamma_table))
    assert not np.allclose(np.asarray(m_cos.schedule.gamma_table),
                           np.asarray(m_poly.schedule.gamma_table))

    # default when the key is absent stays polynomial_2
    del base["diffusion"]["noise_schedule"]
    np.testing.assert_array_equal(np.asarray(model_from_config(base).schedule.gamma_table),
                                  np.asarray(poly.gamma_table))

import numpy as np
import jax.numpy as jnp

from kpdiff_tpu.ops.geometry import masked_com, masked_mean, pairwise_dist, rbf_embed, norm_no_nan


def test_masked_com_ignores_padding():
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(2, 5, 3)).astype(np.float32)
    mask = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], dtype=bool)
    com = np.asarray(masked_com(jnp.asarray(pos), jnp.asarray(mask)))
    np.testing.assert_allclose(com[0], pos[0, :3].mean(0), rtol=1e-6)
    np.testing.assert_allclose(com[1], pos[1].mean(0), rtol=1e-6)


def test_masked_mean_all_masked_row_is_zero():
    x = jnp.ones((1, 4, 2))
    mask = jnp.zeros((1, 4), dtype=bool)
    out = np.asarray(masked_mean(x, mask, axis=1))
    np.testing.assert_allclose(out, 0.0)


def test_pairwise_dist_bruteforce():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(1, 6, 3)).astype(np.float32)
    b = rng.normal(size=(1, 4, 3)).astype(np.float32)
    d = np.asarray(pairwise_dist(jnp.asarray(b), jnp.asarray(a)))  # (1, Ns=6, Nd=4)
    ref = np.linalg.norm(a[0][:, None] - b[0][None], axis=-1)
    np.testing.assert_allclose(d[0], ref, rtol=1e-5, atol=1e-6)


def test_rbf_matches_reference_formula():
    d = jnp.array([0.0, 1.0, 7.5, 20.0])
    out = np.asarray(rbf_embed(d, 0.0, 20.0, 16))
    mu = np.linspace(0, 20, 16)
    sigma = 20 / 16
    ref = np.exp(-(((np.asarray(d)[:, None] - mu) / sigma) ** 2))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-30)  # f32 flushes tails below ~1e-38


def test_norm_no_nan_grad_safe():
    import jax

    g = jax.grad(lambda x: norm_no_nan(x).sum())(jnp.zeros((3, 3)))
    assert np.all(np.isfinite(np.asarray(g)))

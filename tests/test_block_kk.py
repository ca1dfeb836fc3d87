"""Block-dense kk layout: exactness when the window covers everything,
spatial-sort edge recall on realistic pockets."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from kpdiff_tpu.models.complex import synthetic_batch
from kpdiff_tpu.models.diffusion import DiffusionConfig, KeypointDiffusion
from kpdiff_tpu.ops.spatial import block_windows, spatial_sort_permutation


def mk(layout, tile=8):
    dyn = dict(n_layers=2, hidden_nf=16, use_tanh=True, message_norm=0,
               update_kp_feat=True, norm=True, kl_k=3, kk_layout=layout)
    if layout == "block":
        dyn["kk_block_size"] = tile
    return KeypointDiffusion(DiffusionConfig(
        atom_nf=10, rec_nf=10, n_timesteps=5, rec_encoder_type="fixed",
        graph_cutoffs={"rr": 3.5, "rk": 100, "kk": 8, "kl": 8, "ll": 9},
        dynamics=dyn,
    ))


def test_block_windows_static_slicing():
    arr = jnp.arange(2 * 12 * 4.0).reshape(2, 12, 4)
    w = block_windows(arr, 4)  # nt=3, window=12
    assert w.shape == (2, 3, 12, 4)
    # middle tile's window = whole array
    np.testing.assert_array_equal(np.asarray(w[0, 1]), np.asarray(arr[0]))
    # first tile: previous block zero-padded
    assert np.all(np.asarray(w[0, 0, :4]) == 0)
    np.testing.assert_array_equal(np.asarray(w[0, 0, 4:12]), np.asarray(arr[0, :8]))


@pytest.mark.slow
def test_block_equals_dense_when_window_covers_all():
    """With <= 2 tiles the 3-tile window spans the whole set, so block-dense
    must reproduce the dense path exactly (same params, same outputs)."""
    m_dense = mk("dense")
    m_block = mk("block", tile=8)  # n_kp=16 -> nt=2, window covers all
    cpx = synthetic_batch(0, batch=2, n_rec_pad=16, n_lig_pad=8, n_kp=16, kp_feat_dim=10, min_rec=12)
    params = m_dense.init(jax.random.key(0), cpx)

    enc_d, kk_d = m_dense.encode(params, cpx)
    enc_b, kk_b = m_block.encode(params, cpx)
    t = jnp.full((2,), 0.5)
    out_d = m_dense._apply_dynamics(params, enc_d.lig_x, enc_d.lig_h, enc_d.lig_mask,
                                    enc_d.kp_x, enc_d.kp_h, enc_d.kp_mask, t, kk_d)
    out_b = m_block._apply_dynamics(params, enc_b.lig_x, enc_b.lig_h, enc_b.lig_mask,
                                    enc_b.kp_x, enc_b.kp_h, enc_b.kp_mask, t, kk_b)
    # keypoints are permuted by the spatial sort; compare ligand outputs,
    # which are permutation-invariant aggregates
    np.testing.assert_allclose(np.asarray(out_b[0]), np.asarray(out_d[0]), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_b[1]), np.asarray(out_d[1]), rtol=2e-4, atol=1e-5)


def test_spatial_sort_recall_on_pocket_geometry():
    """Morton sorting + 3-tile windows must recover most radius edges on
    pocket-like point clouds."""
    rng = np.random.default_rng(0)
    B, N, tile = 4, 128, 32
    # shell-like pocket: points at radius 5-10 around the origin
    d = rng.normal(size=(B, N, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    x = (d * rng.uniform(5, 10, size=(B, N, 1))).astype(np.float32)
    mask = np.ones((B, N), bool)

    perm = np.asarray(spatial_sort_permutation(jnp.asarray(x), jnp.asarray(mask)))
    xs = np.take_along_axis(x, perm[..., None], axis=1)

    cutoff = 3.5
    total, covered = 0, 0
    for b in range(B):
        dm = np.linalg.norm(xs[b][:, None] - xs[b][None], axis=-1)
        adj = (dm < cutoff) & ~np.eye(N, dtype=bool)
        ti = np.arange(N) // tile
        in_window = np.abs(ti[:, None] - ti[None, :]) <= 1
        total += adj.sum()
        covered += (adj & in_window).sum()
    recall = covered / max(total, 1)
    assert recall > 0.75, recall
@pytest.mark.slow


def test_block_sampler_runs():
    m = mk("block", tile=8)
    cpx = synthetic_batch(1, batch=2, n_rec_pad=16, n_lig_pad=8, n_kp=16, kp_feat_dim=10, min_rec=12)
    params = m.init(jax.random.key(1), cpx)
    enc, kk = m.encode(params, cpx)
    out = m.sample(params, jax.random.key(2), enc, kk)
    assert np.all(np.isfinite(np.asarray(out["lig_x"])))

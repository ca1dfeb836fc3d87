"""Quantify the block-dense rr layout's effect on encoder outputs vs the
exact capped-neighbor-list layout on protein-density geometry (VERDICT r1
weak #5: an imported reference checkpoint evaluated under the block layout
sees different rr graphs than it was trained on).

The eval-mode switch is `--set rec_encoder.rr_layout=nbr` (exact-cap
semantics); this test measures the delta the default block layout
introduces at the shipped tile size."""
import numpy as np
import jax
import pytest

from kpdiff_tpu.models.complex import synthetic_batch
from kpdiff_tpu.models.diffusion import DiffusionConfig, KeypointDiffusion


def mk(rr_layout, arch="egnn"):
    enc = dict(n_convs=2, hidden_n_node_feat=32, out_n_node_feat=32, use_tanh=True,
               message_norm=1, k_closest=3, rr_layout=rr_layout, rr_block_size=64) \
        if arch == "egnn" else \
        dict(in_scalar_size=10, n_keypoints=6, out_scalar_size=32, vector_size=4,
             n_rr_convs=2, n_rk_convs=2, message_norm=10, k_closest=3,
             n_message_gvps=1, n_update_gvps=1, rr_layout=rr_layout, rr_block_size=64)
    dyn = dict(n_layers=1, hidden_nf=32, use_tanh=True, message_norm=1, kl_k=3) \
        if arch == "egnn" else \
        dict(vector_size=4, n_convs=1, n_hidden_scalars=32, update_kp=False, message_norm=10,
             kl_k=3, n_message_gvps=1, n_update_gvps=1, n_noise_gvps=2)
    return KeypointDiffusion(DiffusionConfig(
        atom_nf=10, rec_nf=32, n_timesteps=10, architecture=arch, rec_encoder_type="learned",
        graph_cutoffs={"rr": 3.5, "rk": 100, "kk": 8, "kl": 8, "ll": 5},
        dynamics=dyn, rec_encoder=enc, rec_encoder_loss=dict(loss_type="none"),
    ))


@pytest.mark.slow
@pytest.mark.parametrize("arch", ["egnn", "gvp"])
def test_block_rr_vs_nbr_delta_on_protein_density(arch):
    """At the shipped tile size on protein-density pockets (min_sep=1.8 A,
    384 atoms = 6 Morton tiles), the banded rr layout must reproduce the
    exact layout's keypoints to small relative error — the quantified
    bound backing PARITY.md deviation 3."""
    m_blk = mk("block", arch)
    m_nbr = mk("nbr", arch)
    cpx = synthetic_batch(31, batch=4, n_rec_pad=384, n_lig_pad=16, n_kp=6,
                          kp_feat_dim=32, kp_vec_dim=4 if arch == "gvp" else None,
                          min_rec=300, min_lig=10, min_sep=1.8)
    params = m_nbr.init(jax.random.key(0), cpx)
    enc_b, _ = m_blk.encode(params, cpx)
    enc_n, _ = m_nbr.encode(params, cpx)

    dx = np.abs(np.asarray(enc_b.kp_x) - np.asarray(enc_n.kp_x))
    scale_x = np.abs(np.asarray(enc_n.kp_x)).mean()
    dh = np.abs(np.asarray(enc_b.kp_h) - np.asarray(enc_n.kp_h))
    scale_h = np.abs(np.asarray(enc_n.kp_h)).mean() + 1e-8
    # documented bound (PARITY.md deviation 3): keypoint positions within
    # 0.1 A and features within 12% mean-relative of the exact layout on
    # realistic geometry with UNTRAINED random weights (random nets amplify
    # graph deltas; trained encoders are smoother). Parity-grade evals
    # should still run rr_layout: nbr.
    assert dx.max() < 0.1, f"kp_x delta {dx.max():.4f} A (mean |x|={scale_x:.2f})"
    assert dh.mean() / scale_h < 0.12, f"kp_h rel delta {dh.mean() / scale_h:.4f}"


def test_block_rr_recall_on_protein_density():
    """Edge recall of the banded block rr layout vs the exact radius graph
    on protein-density geometry."""
    import jax.numpy as jnp

    from kpdiff_tpu.ops.spatial import block_windows, choose_tile, spatial_sort_permutation

    cpx = synthetic_batch(37, batch=4, n_rec_pad=384, n_lig_pad=16, n_kp=6,
                          kp_feat_dim=32, min_rec=300, min_lig=10, min_sep=1.8)
    x0, mask = cpx.rec_x, cpx.rec_mask
    perm = spatial_sort_permutation(x0, mask)
    xs = jnp.take_along_axis(x0, perm[..., None], axis=1)
    ms = jnp.take_along_axis(mask, perm, axis=1)
    tile = choose_tile(xs.shape[1], 64)
    xw = block_windows(xs, tile)
    mw = block_windows(ms, tile)
    b, nt, w = mw.shape
    xt = xs.reshape(b, nt, tile, 3)
    mt = ms.reshape(b, nt, tile)
    d2 = jnp.sum(jnp.square(xw[:, :, :, None, :] - xt[:, :, None, :, :]), axis=-1)
    valid = mw[:, :, :, None] & mt[:, :, None, :]
    eye = jnp.zeros((w, tile), bool).at[jnp.arange(tile) + tile, jnp.arange(tile)].set(True)
    n_block = int(jnp.sum((d2 < 3.5**2) & valid & ~eye[None, None]))

    # exact count
    d = np.linalg.norm(np.asarray(xs)[:, :, None] - np.asarray(xs)[:, None, :], axis=-1)
    mm = np.asarray(ms)
    exact = 0
    for i in range(b):
        dm = d[i][np.ix_(mm[i], mm[i])]
        exact += int(((dm < 3.5) & (dm > 0)).sum())
    recall = n_block / max(exact, 1)
    # characterization: measured ~0.90 at tile 64 on protein-density pockets
    # (the PARITY.md deviation-3 number); the exact 'nbr' layout is the
    # default precisely because of this
    assert 0.85 < recall < 1.0, f"block rr recall {recall:.4f} on protein-density pockets"

import numpy as np
import jax.numpy as jnp

from kpdiff_tpu.ops.neighbors import (
    dense_radius_adjacency,
    dense_knn_adjacency,
    knn_indices,
    radius_neighbor_list,
)


def _random_points(rng, b, n):
    return rng.normal(size=(b, n, 3)).astype(np.float32) * 3.0


def test_dense_radius_matches_bruteforce():
    rng = np.random.default_rng(0)
    x = _random_points(rng, 2, 12)
    mask = np.ones((2, 12), dtype=bool)
    mask[0, 9:] = False
    adj = np.asarray(
        dense_radius_adjacency(jnp.asarray(x), jnp.asarray(mask), jnp.asarray(x), jnp.asarray(mask), 4.0, exclude_self=True)
    )
    for b in range(2):
        for i in range(12):
            for j in range(12):
                d = np.linalg.norm(x[b, i] - x[b, j])
                expect = (d < 4.0) and i != j and mask[b, i] and mask[b, j]
                assert adj[b, i, j] == expect, (b, i, j)


def test_dense_knn_per_dst_bruteforce():
    rng = np.random.default_rng(1)
    src = _random_points(rng, 1, 10)
    dst = _random_points(rng, 1, 7)
    msrc = np.ones((1, 10), dtype=bool)
    msrc[0, 8:] = False
    mdst = np.ones((1, 7), dtype=bool)
    k = 3
    adj = np.asarray(
        dense_knn_adjacency(jnp.asarray(src), jnp.asarray(msrc), jnp.asarray(dst), jnp.asarray(mdst), k, per="dst")
    )  # (1, Ns, Nd)
    for d in range(7):
        dists = np.linalg.norm(src[0] - dst[0, d], axis=-1)
        dists[~msrc[0]] = np.inf
        nearest = set(np.argsort(dists)[:k])
        marked = set(np.where(adj[0, :, d])[0])
        assert marked == nearest


def test_dense_knn_per_src_bruteforce():
    rng = np.random.default_rng(2)
    src = _random_points(rng, 1, 5)  # keypoints
    dst = _random_points(rng, 1, 9)  # ligand atoms
    msrc = np.ones((1, 5), dtype=bool)
    mdst = np.ones((1, 9), dtype=bool)
    mdst[0, 7:] = False
    k = 4
    adj = np.asarray(
        dense_knn_adjacency(jnp.asarray(src), jnp.asarray(msrc), jnp.asarray(dst), jnp.asarray(mdst), k, per="src")
    )
    for s in range(5):
        dists = np.linalg.norm(dst[0] - src[0, s], axis=-1)
        dists[~mdst[0]] = np.inf
        nearest = set(np.argsort(dists)[:k])
        marked = set(np.where(adj[0, s, :])[0])
        assert marked == nearest


def test_knn_fewer_valid_than_k():
    rng = np.random.default_rng(3)
    src = _random_points(rng, 1, 6)
    dst = _random_points(rng, 1, 4)
    msrc = np.zeros((1, 6), dtype=bool)
    msrc[0, :2] = True  # only 2 valid sources but k=5
    mdst = np.ones((1, 4), dtype=bool)
    adj = np.asarray(
        dense_knn_adjacency(jnp.asarray(src), jnp.asarray(msrc), jnp.asarray(dst), jnp.asarray(mdst), 5, per="dst")
    )
    assert adj[:, 2:, :].sum() == 0
    assert (adj.sum(axis=1) == 2).all()  # every dst got exactly the 2 valid srcs


def test_knn_indices_sorted_ascending():
    rng = np.random.default_rng(4)
    src = _random_points(rng, 1, 20)
    dst = _random_points(rng, 1, 3)
    m_s = np.ones((1, 20), dtype=bool)
    m_d = np.ones((1, 3), dtype=bool)
    idx, dist, valid = knn_indices(jnp.asarray(src), jnp.asarray(m_s), jnp.asarray(dst), jnp.asarray(m_d), 5)
    idx, dist, valid = map(np.asarray, (idx, dist, valid))
    assert valid.all()
    for d in range(3):
        ref = np.sort(np.linalg.norm(src[0] - dst[0, d], axis=-1))[:5]
        np.testing.assert_allclose(dist[0, d], ref, rtol=1e-4, atol=1e-5)
        assert np.all(np.diff(dist[0, d]) >= -1e-6)


def test_radius_neighbor_list_keeps_nearest_within_radius():
    rng = np.random.default_rng(5)
    x = _random_points(rng, 1, 30)
    mask = np.ones((1, 30), dtype=bool)
    idx, valid = radius_neighbor_list(
        jnp.asarray(x), jnp.asarray(mask), jnp.asarray(x), jnp.asarray(mask), radius=5.0, max_neighbors=8, exclude_self=True
    )
    idx, valid = np.asarray(idx), np.asarray(valid)
    for d in range(30):
        dists = np.linalg.norm(x[0] - x[0, d], axis=-1)
        dists[d] = np.inf
        within = np.sort(dists[dists < 5.0])[:8]
        got = np.sort(np.linalg.norm(x[0, idx[0, d][valid[0, d]]] - x[0, d], axis=-1))
        np.testing.assert_allclose(got, within, rtol=1e-4, atol=1e-5)

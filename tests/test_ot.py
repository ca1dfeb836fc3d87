"""OT loss: C++ network simplex vs scipy LP exactness, sinkhorn closeness,
masked batching, encoder integration."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kpdiff_tpu.losses.ot import ot_loss, sinkhorn_plan, _pair_cost
from kpdiff_tpu.native.emd import exact_emd_plan, _linprog_plan, _load_lib


def random_cost(rng, n, m):
    a = rng.normal(size=(n, 3))
    b = rng.normal(size=(m, 3)) * 2
    return ((a[:, None] - b[None]) ** 2).sum(-1)


def test_cpp_solver_builds_and_matches_lp():
    rng = np.random.default_rng(0)
    assert _load_lib() is not None, "libemd.so failed to build"
    for n, m in [(3, 5), (8, 8), (20, 37), (40, 100)]:
        cost = random_cost(rng, n, m)
        plan = exact_emd_plan(cost)
        a = np.full(n, 1 / n)
        b = np.full(m, 1 / m)
        # feasibility
        np.testing.assert_allclose(plan.sum(1), a, atol=1e-9)
        np.testing.assert_allclose(plan.sum(0), b, atol=1e-9)
        # optimality vs LP
        lp = _linprog_plan(cost, a, b)
        np.testing.assert_allclose((plan * cost).sum(), (lp * cost).sum(), rtol=1e-7, atol=1e-9)


def test_cpp_solver_degenerate_cases():
    rng = np.random.default_rng(1)
    # equal sizes (assignment-like), duplicated points (ties), 1-row
    for n, m in [(5, 5), (1, 7), (6, 2)]:
        pts = rng.normal(size=(m, 3))
        cost = random_cost(rng, n, m)
        cost[0] = cost[min(1, n - 1)]  # duplicate rows -> degenerate pivots
        plan = exact_emd_plan(cost)
        lp = _linprog_plan(cost, np.full(n, 1 / n), np.full(m, 1 / m))
        np.testing.assert_allclose((plan * cost).sum(), (lp * cost).sum(), rtol=1e-6, atol=1e-9)


def test_sinkhorn_close_to_exact():
    rng = np.random.default_rng(2)
    B, K, P = 3, 8, 20
    kp = rng.normal(size=(B, K, 3)).astype(np.float32)
    pts = rng.normal(size=(B, P, 3)).astype(np.float32) * 2
    pmask = np.ones((B, P), bool)
    pmask[0, 15:] = False
    kmask = np.ones((B, K), bool)

    exact_vals = []
    for i in range(B):
        m = pmask[i].sum()
        cost = ((kp[i][:, None] - pts[i][:m][None]) ** 2).sum(-1)
        plan = exact_emd_plan(cost)
        exact_vals.append((plan * cost).sum())
    exact_mean = np.mean(exact_vals)

    loss_sk = float(
        ot_loss(jnp.asarray(kp), jnp.asarray(kmask), jnp.asarray(pts), jnp.asarray(pmask),
                method="sinkhorn", sinkhorn_eps=0.01, sinkhorn_iters=500)
    )
    # entropic bias is small at eps=0.01 relative cost scale
    assert abs(loss_sk - exact_mean) / exact_mean < 0.05, (loss_sk, exact_mean)

    loss_ex = float(
        ot_loss(jnp.asarray(kp), jnp.asarray(kmask), jnp.asarray(pts), jnp.asarray(pmask), method="exact")
    )
    np.testing.assert_allclose(loss_ex, exact_mean, rtol=1e-5)


def test_sinkhorn_plan_marginals():
    rng = np.random.default_rng(3)
    B, K, P = 2, 6, 11
    cost = jnp.asarray(rng.random((B, K, P)).astype(np.float32))
    pmask = np.ones((B, P), bool)
    pmask[1, 8:] = False
    plan = np.asarray(sinkhorn_plan(cost, jnp.asarray(pmask), eps=0.05, iters=300))
    np.testing.assert_allclose(plan.sum(2), 1 / K, atol=1e-3)
    np.testing.assert_allclose(plan[1, :, 8:], 0.0, atol=1e-8)
    np.testing.assert_allclose(plan[1].sum(0)[:8], 1 / 8, atol=1e-3)


def test_ot_loss_grad_flows_through_cost_only():
    rng = np.random.default_rng(4)
    kp = jnp.asarray(rng.normal(size=(1, 5, 3)).astype(np.float32))
    pts = jnp.asarray(rng.normal(size=(1, 9, 3)).astype(np.float32))
    km = jnp.ones((1, 5), bool)
    pm = jnp.ones((1, 9), bool)
    g = jax.grad(lambda k: ot_loss(k, km, pts, pm, method="sinkhorn"))(kp)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


def test_exact_plan_under_jit():
    """pure_callback exact solver must work inside jit (loss path)."""
    rng = np.random.default_rng(5)
    kp = jnp.asarray(rng.normal(size=(2, 4, 3)).astype(np.float32))
    pts = jnp.asarray(rng.normal(size=(2, 9, 3)).astype(np.float32))
    km = jnp.ones((2, 4), bool)
    pm = jnp.ones((2, 9), bool)
    f = jax.jit(lambda k: ot_loss(k, km, pts, pm, method="exact"))
    v1 = float(f(kp))
    v2 = float(ot_loss(kp, km, pts, pm, method="exact"))
    np.testing.assert_allclose(v1, v2, rtol=1e-6)


def test_ot_loss_ignores_empty_padded_rows():
    """Repeat-padded batch rows (all-zero masks) must not poison the OT
    mean — regression for the exploding test_rec_encoder seen when the
    bucketed loader pads a final partial batch."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    kp = jnp.asarray(rng.normal(size=(3, 5, 3)).astype(np.float32) * 5)
    pts = jnp.asarray(rng.normal(size=(3, 7, 3)).astype(np.float32) * 5)
    kp_mask = jnp.ones((3, 5), bool)
    pts_mask = jnp.ones((3, 7), bool).at[2].set(False)  # row 2 = padded/empty

    full = float(ot_loss(kp[:2], kp_mask[:2], pts[:2], pts_mask[:2]))
    with_pad = float(ot_loss(kp, kp_mask, pts, pts_mask))
    np.testing.assert_allclose(with_pad, full, rtol=1e-5)
    assert np.isfinite(with_pad)

"""Training loop: scheduler golden values, smoke train (loss decreases),
data-parallel equivalence on the 8-device CPU mesh, checkpoint roundtrip.

CI gate note: `pytest -m "not slow" tests/test_training.py` is the fast
gate — ~2.5 min on the 8-device CPU platform (the heavy rows: grad-accum
exactness ~53 s, non-finite skip ~31 s). Multi-device-mesh equivalence,
the remat backward compile (~194 s), and the smoke train are `slow`; the
full file is >10 min on CPU and is meant for the slow lane only."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kpdiff_tpu.config import PaddingConfig
from kpdiff_tpu.data.dataset import PaddedLoader, synthetic_dataset
from kpdiff_tpu.models.complex import synthetic_batch
from kpdiff_tpu.models.diffusion import DiffusionConfig, KeypointDiffusion
from kpdiff_tpu.parallel.mesh import make_mesh, shard_batch_pytree
from kpdiff_tpu.training.scheduler import SchedulerConfig, learning_rate, rec_encoder_weight
from kpdiff_tpu.training.trainer import (
    TrainConfig,
    init_train_state,
    load_checkpoint,
    make_optimizer,
    make_train_step,
    save_checkpoint,
)


def tiny_model():
    cfg = DiffusionConfig(
        atom_nf=10,
        rec_nf=10,
        n_timesteps=50,
        precision=1e-5,
        rec_encoder_type="fixed",
        dynamics=dict(n_layers=1, hidden_nf=16, use_tanh=True, message_norm=1, norm=True, kl_k=3),
    )
    return KeypointDiffusion(cfg)


# ------------------------------------------------------------- scheduler

def test_warmup_lr():
    cfg = SchedulerConfig(base_lr=1e-4, warmup_length=1.0)
    assert float(learning_rate(cfg, 0.5)) == pytest.approx(5e-5)
    assert float(learning_rate(cfg, 1.0)) == pytest.approx(1e-4)
    assert float(learning_rate(cfg, 3.0)) == pytest.approx(1e-4)


def test_cosine_restarts():
    cfg = SchedulerConfig(base_lr=1e-4, warmup_length=1.0, restart_interval=10.0, restart_type="cosine")
    # at a restart boundary the LR snaps back to base (scheduler.py:82-84)
    assert float(learning_rate(cfg, 1.0 + 1e-6)) == pytest.approx(1e-4, rel=1e-3)
    # halfway through an interval, cosine gives base/2
    assert float(learning_rate(cfg, 6.0)) == pytest.approx(5e-5, rel=1e-3)


def test_linear_restarts():
    cfg = SchedulerConfig(base_lr=1e-4, warmup_length=0.0, restart_interval=4.0, restart_type="linear")
    assert float(learning_rate(cfg, 1.0)) == pytest.approx(1e-4 * 0.75, rel=1e-4)


def test_rec_enc_weight_sigmoid():
    cfg = SchedulerConfig(rec_enc_loss_weight=0.1, rec_enc_weight_decay_midpoint=10.0, rec_enc_weight_decay_scale=0.25)
    # matches the reference formula (scheduler.py:65-74)
    for e in [0.0, 5.0, 10.0, 20.0]:
        coeff = 1 - 1 / (1 + np.exp(-(e - 10.0) * 0.25))
        assert float(rec_encoder_weight(cfg, e)) == pytest.approx(0.1 * coeff, rel=1e-5)
    cfg0 = SchedulerConfig(rec_enc_loss_weight=0.1, rec_enc_weight_decay_midpoint=0)
    assert float(rec_encoder_weight(cfg0, 7.0)) == pytest.approx(0.1)


# ------------------------------------------------------------- training

@pytest.mark.slow
def test_smoke_train_loss_decreases():
    model = tiny_model()
    ds = synthetic_dataset(16, seed=0, rec_range=(16, 32), lig_range=(6, 12))
    pad = PaddingConfig(n_rec=32, n_lig=12, n_kp=32, n_ip=8)
    loader = PaddedLoader(ds, pad, batch_size=8, n_kp=32, kp_feat_dim=10, seed=0)

    tcfg = TrainConfig(learning_rate=1e-3, batch_size=8, scheduler=SchedulerConfig(base_lr=1e-3))
    opt = make_optimizer(tcfg)
    batch0 = next(iter(loader.epoch()))
    state = init_train_state(model, opt, jax.random.key(0), batch0)
    step = make_train_step(model, tcfg, opt, iters_per_epoch=2)

    losses = []
    rng = jax.random.key(1)
    for epoch in range(16):
        for batch in loader.epoch():
            rng, k = jax.random.split(rng)
            state, metrics = step(state, k, batch)
            losses.append(float(metrics["l2"]))
    # per-step l2 is noisy (random t per graph); compare quartile means
    q = max(len(losses) // 4, 1)
    assert np.mean(losses[:q]) > np.mean(losses[-q:]), losses
    assert all(np.isfinite(losses))


@pytest.mark.slow
def test_data_parallel_matches_single_device():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    model = tiny_model()
    cpx = synthetic_batch(11, batch=8, n_rec_pad=24, n_lig_pad=10, n_kp=24, kp_feat_dim=10)
    tcfg = TrainConfig(learning_rate=1e-3, scheduler=SchedulerConfig(base_lr=1e-3))
    opt = make_optimizer(tcfg)
    state = init_train_state(model, opt, jax.random.key(2), cpx)

    step_single = make_train_step(model, tcfg, opt, iters_per_epoch=10)
    s1, m1 = step_single(state, jax.random.key(3), cpx)

    mesh = make_mesh(8)
    step_dp = make_train_step(model, tcfg, opt, iters_per_epoch=10, mesh=mesh)
    state2 = init_train_state(model, opt, jax.random.key(2), cpx)
    cpx_sharded = shard_batch_pytree(cpx, mesh)
    s2, m2 = step_dp(state2, jax.random.key(3), cpx_sharded)

    np.testing.assert_allclose(float(m1["l2"]), float(m2["l2"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l1, l2):
        # cross-device psum reduction order differs from a single-device sum
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    model = tiny_model()
    cpx = synthetic_batch(12, batch=2, n_rec_pad=16, n_lig_pad=8, n_kp=16, kp_feat_dim=10)
    tcfg = TrainConfig()
    opt = make_optimizer(tcfg)
    state = init_train_state(model, opt, jax.random.key(4), cpx)
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    save_checkpoint(tmp_path / "ck", state)
    restored = load_checkpoint(tmp_path / "ck", state)
    assert int(restored.step) == 7
    for a, b in zip(jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_data_parallel_matches_single_device_gvp():
    """Same DP==single equivalence for the GVP architecture (learned
    encoder + OT loss + flat vectors + kNN pair-list kl/lk)."""
    assert jax.device_count() >= 8
    model = KeypointDiffusion(DiffusionConfig(
        atom_nf=10, rec_nf=16, n_timesteps=10, architecture="gvp", rec_encoder_type="learned",
        graph_cutoffs={"rr": 3.5, "rk": 100, "kk": 8, "kl": 8, "ll": 6},
        dynamics=dict(vector_size=4, n_convs=1, n_hidden_scalars=16, update_kp=True,
                      message_norm="mean", kl_k=2, n_message_gvps=1, n_update_gvps=1,
                      n_noise_gvps=2),
        rec_encoder=dict(in_scalar_size=10, n_keypoints=4, out_scalar_size=16, vector_size=4,
                         n_rr_convs=1, n_rk_convs=1, message_norm="mean", k_closest=2,
                         n_message_gvps=1, n_update_gvps=1),
        rec_encoder_loss=dict(loss_type="optimal_transport", use_interface_points=True,
                              method="sinkhorn"),
    ))
    cpx = synthetic_batch(13, batch=8, n_rec_pad=20, n_lig_pad=8, n_kp=4,
                          kp_feat_dim=16, kp_vec_dim=4, min_rec=14)
    tcfg = TrainConfig(learning_rate=1e-3, scheduler=SchedulerConfig(base_lr=1e-3))
    opt = make_optimizer(tcfg)
    state = init_train_state(model, opt, jax.random.key(2), cpx)

    step_single = make_train_step(model, tcfg, opt, iters_per_epoch=10)
    s1, m1 = step_single(state, jax.random.key(3), cpx)

    mesh = make_mesh(8)
    step_dp = make_train_step(model, tcfg, opt, iters_per_epoch=10, mesh=mesh)
    state2 = init_train_state(model, opt, jax.random.key(2), cpx)
    s2, m2 = step_dp(state2, jax.random.key(3), shard_batch_pytree(cpx, mesh))

    np.testing.assert_allclose(float(m1["l2"]), float(m2["l2"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["rec_encoder"]), float(m2["rec_encoder"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


@pytest.mark.slow  # ~194 s on CPU: compiles the remat backward twice
def test_remat_convs_exact_equivalence():
    """`dynamics.remat` / `dynamics_gvp.remat` rematerialize the conv layers
    in the backward pass (the HBM fix that lets the all-atom/ca configs
    train at reference batch sizes on one 16G chip). jax.checkpoint is
    exact math; XLA refuses only bitwise identity (fusion boundaries move,
    so rounding differs in the last ulp). One optimizer step must produce
    metrics and updated params equal to tight float32 tolerance with the
    flag on and off, for both architectures."""
    cpx = synthetic_batch(17, batch=4, n_rec_pad=24, n_lig_pad=10, n_kp=24,
                          kp_feat_dim=10, kp_vec_dim=4, min_rec=16)
    tcfg = TrainConfig(learning_rate=1e-3, scheduler=SchedulerConfig(base_lr=1e-3))
    opt = make_optimizer(tcfg)

    def one_step(model):
        state = init_train_state(model, opt, jax.random.key(4), cpx)
        step = make_train_step(model, tcfg, opt, iters_per_epoch=10)
        return step(state, jax.random.key(5), cpx)

    def egnn(remat):
        return KeypointDiffusion(DiffusionConfig(
            atom_nf=10, rec_nf=10, n_timesteps=20, rec_encoder_type="fixed",
            dynamics=dict(n_layers=2, hidden_nf=16, message_norm=0.0,
                          update_kp_feat=True, norm=True, kl_k=3, remat=remat),
        ))

    def gvp(remat):
        return KeypointDiffusion(DiffusionConfig(
            atom_nf=10, rec_nf=10, n_timesteps=20, architecture="gvp",
            rec_encoder_type="fixed",
            dynamics=dict(vector_size=4, n_convs=2, n_hidden_scalars=16,
                          update_kp=True, message_norm="mean", kl_k=3,
                          n_message_gvps=1, n_update_gvps=1, n_noise_gvps=2,
                          remat=remat),
        ))

    for family in (egnn, gvp):
        s_off, m_off = one_step(family(False))
        s_on, m_on = one_step(family(True))
        for key in m_off:
            np.testing.assert_allclose(np.asarray(m_off[key]), np.asarray(m_on[key]),
                                       rtol=5e-6, atol=1e-7)
        leaves_off = jax.tree_util.tree_leaves(s_off.params)
        leaves_on = jax.tree_util.tree_leaves(s_on.params)
        assert len(leaves_off) == len(leaves_on)  # remat must not change param structure
        for a, b in zip(leaves_off, leaves_on):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_loss_finite_with_empty_batch_rows():
    """PaddedLoader repeat-pads the final partial batch with zero-mask rows
    (dataset.py:271-276); the dynamics may emit NaN for an all-masked item,
    which must not poison the batch-global loss sums (the round-2 demo run
    logged test_l2 = NaN through exactly this path). Also asserts the
    jnp.where residual selection is value-identical to the masked multiply
    on an all-real batch."""
    model = tiny_model()
    cpx = synthetic_batch(3, batch=4, n_rec_pad=24, n_lig_pad=10, n_kp=24,
                          kp_feat_dim=10, min_rec=12, min_lig=4)
    params = model.init(jax.random.key(0), cpx)
    ref = {k: float(v) for k, v in model.loss(params, jax.random.key(1), cpx).items()}

    def zero_row(mask):
        m = np.array(mask)
        m[3] = False
        return jnp.asarray(m)

    cpx_empty = cpx.replace(
        lig_mask=zero_row(cpx.lig_mask), rec_mask=zero_row(cpx.rec_mask),
        ip_mask=zero_row(cpx.ip_mask),
    )
    losses = model.loss(params, jax.random.key(1), cpx_empty)
    assert all(np.isfinite(float(v)) for v in losses.values()), losses
    # the all-real batch is untouched by the guard
    again = {k: float(v) for k, v in model.loss(params, jax.random.key(1), cpx).items()}
    assert again == ref


def test_params_npz_roundtrip(tmp_path):
    """Flat-npz param archives (utils/params_io.py) roundtrip exactly and
    reject mismatched templates — the loading path bench.py uses for the
    trained-regime benchmark."""
    from kpdiff_tpu.utils.params_io import load_params_npz, save_params_npz

    model = tiny_model()
    cpx = synthetic_batch(1, batch=2, n_rec_pad=16, n_lig_pad=8, n_kp=16, kp_feat_dim=10)
    params = model.init(jax.random.key(0), cpx)
    path = tmp_path / "p.npz"
    save_params_npz(params, path)
    back = load_params_npz(path, params)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(back),
    ):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        assert np.array_equal(np.asarray(a), np.asarray(b)), ka

    bad = jax.tree_util.tree_map(lambda x: np.zeros(x.shape + (2,), x.dtype), params)
    with pytest.raises(ValueError):
        load_params_npz(path, bad)


def test_nonfinite_update_skipped():
    """A batch that produces a non-finite loss must not change params or
    optimizer state (trainer.py keep_finite); the next finite batch must
    update normally. SURVEY §5.3 failure recovery."""
    model = tiny_model()
    cpx = synthetic_batch(2, batch=4, n_rec_pad=16, n_lig_pad=8, n_kp=16, kp_feat_dim=10)
    tcfg = TrainConfig(learning_rate=1e-3, batch_size=4, scheduler=SchedulerConfig(base_lr=1e-3))
    opt = make_optimizer(tcfg)
    state = init_train_state(model, opt, jax.random.key(0), cpx)
    step = make_train_step(model, tcfg, opt, iters_per_epoch=2)

    before = [np.asarray(l) for l in jax.tree_util.tree_leaves(state.params)]
    step0 = int(state.step)
    bad = cpx.replace(lig_h=cpx.lig_h.at[0, 0, 0].set(jnp.inf))
    state_bad, metrics = step(state, jax.random.key(1), bad)  # donates state
    assert float(metrics["skipped_nonfinite"]) == 1.0
    mid = [np.asarray(l) for l in jax.tree_util.tree_leaves(state_bad.params)]
    for a, b in zip(before, mid):
        assert np.array_equal(a, b)
    assert int(state_bad.step) == step0 + 1  # step still advances

    state_good, metrics2 = step(state_bad, jax.random.key(1), cpx)
    assert float(metrics2["skipped_nonfinite"]) == 0.0
    assert np.isfinite(float(metrics2["l2"]))
    after = [np.asarray(l) for l in jax.tree_util.tree_leaves(state_good.params)]
    assert any(not np.array_equal(a, b) for a, b in zip(mid, after))


def test_metrics_log_resume_appends(tmp_path):
    """MetricsLog must keep prior rows on re-open (resume), not truncate."""
    import pickle

    from kpdiff_tpu.training.trainer import MetricsLog

    p = tmp_path / "m.pkl"
    log = MetricsLog(p)
    log.append(l2=1.0, epoch=0.5)
    log2 = MetricsLog(p)  # simulates a resume
    log2.append(l2=0.5, epoch=1.0)
    rows = pickle.load(open(p, "rb"))
    assert [r["epoch"] for r in rows] == [0.5, 1.0]
    assert rows[1]["time_passed"] >= rows[0]["time_passed"]


@pytest.mark.slow
def test_dp_x_mp_train_step_matches_single_device():
    """dp2 x mp4 mesh: batch on 'data' AND keypoint axis on 'model'
    (make_train_step(kp_axis=...) -> kp_constraint_fn). Same update as the
    single-device step up to collective reduction order."""
    assert jax.device_count() >= 8
    model = tiny_model()
    cpx = synthetic_batch(11, batch=8, n_rec_pad=24, n_lig_pad=10, n_kp=24, kp_feat_dim=10)
    tcfg = TrainConfig(learning_rate=1e-3, scheduler=SchedulerConfig(base_lr=1e-3))
    opt = make_optimizer(tcfg)
    state = init_train_state(model, opt, jax.random.key(2), cpx)

    step_single = make_train_step(model, tcfg, opt, iters_per_epoch=10)
    s1, m1 = step_single(state, jax.random.key(3), cpx)

    mesh = make_mesh(8, axis_names=("data", "model"), axis_sizes=(2, 4))
    step_mp = make_train_step(model, tcfg, opt, iters_per_epoch=10, mesh=mesh,
                              kp_axis="model")
    state2 = init_train_state(model, opt, jax.random.key(2), cpx)
    cpx_sharded = shard_batch_pytree(cpx, mesh)
    s2, m2 = step_mp(state2, jax.random.key(3), cpx_sharded)

    np.testing.assert_allclose(float(m1["l2"]), float(m2["l2"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_kp_axis_requires_divisible_keypoints():
    # fixed encoder: kp capacity = n_rec_pad (20, not divisible by 8)
    model = tiny_model()
    cpx = synthetic_batch(11, batch=8, n_rec_pad=20, n_lig_pad=10, n_kp=20, kp_feat_dim=10)
    tcfg = TrainConfig(learning_rate=1e-3, scheduler=SchedulerConfig(base_lr=1e-3))
    opt = make_optimizer(tcfg)
    state = init_train_state(model, opt, jax.random.key(2), cpx)
    mesh = make_mesh(8, axis_names=("data", "model"), axis_sizes=(1, 8))
    step = make_train_step(model, tcfg, opt, iters_per_epoch=10, mesh=mesh, kp_axis="model")
    with pytest.raises(ValueError, match="divisible"):
        step(state, jax.random.key(3), shard_batch_pytree(cpx, mesh))


# ------------------------------------------------------- grad accumulation

def test_grad_accum_matches_micro_gradient_mean():
    """grad_accum=A step == optimizer update on the exact mean of the A
    micro-batch gradients (same folded keys, same scheduler values) — the
    seam that lets the all_atom configs train at reference effective batch
    sizes on a 16G chip (benchmarks/train_memory.py)."""
    import optax

    from kpdiff_tpu.training.trainer import _set_lr

    model = tiny_model()
    cpx = synthetic_batch(21, batch=8, n_rec_pad=24, n_lig_pad=10, n_kp=24,
                          kp_feat_dim=10)
    tcfg = TrainConfig(learning_rate=1e-3, grad_accum=2,
                       scheduler=SchedulerConfig(base_lr=1e-3))
    opt = make_optimizer(tcfg)
    state = init_train_state(model, opt, jax.random.key(4), cpx)
    step = make_train_step(model, tcfg, opt, iters_per_epoch=10)
    key = jax.random.key(5)

    # manual replica of the accumulated update (BEFORE the step call — the
    # step donates the state, deleting the original param buffers)
    sched = tcfg.scheduler
    w_rec = rec_encoder_weight(sched, 0.0)
    lr = learning_rate(sched, 0.0)

    def full_loss(params, k, mb):
        losses = model.loss(params, k, mb)
        return losses["l2"] + w_rec * losses["rec_encoder"], losses

    keys = jax.random.split(key, 2)
    micro = lambda i: jax.tree_util.tree_map(
        lambda x: x.reshape((2, 4) + x.shape[1:])[i], cpx)
    g_tot = None
    l2s = []
    for i in range(2):
        (tot_i, losses_i), g_i = jax.value_and_grad(full_loss, has_aux=True)(
            state.params, keys[i], micro(i))
        l2s.append(float(losses_i["l2"]))
        g_tot = g_i if g_tot is None else jax.tree_util.tree_map(jnp.add, g_tot, g_i)
    g_mean = jax.tree_util.tree_map(lambda g: g / 2.0, g_tot)

    opt_state = _set_lr(state.opt_state, lr)
    updates, _ = opt.update(g_mean, opt_state, state.params)
    params_ref = optax.apply_updates(state.params, updates)
    params_ref = jax.device_get(params_ref)

    s_acc, m_acc = step(state, key, cpx)

    assert float(m_acc["l2"]) == pytest.approx(np.mean(l2s), rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_acc.params),
                    jax.tree_util.tree_leaves(params_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_grad_accum_requires_divisible_batch():
    model = tiny_model()
    cpx = synthetic_batch(22, batch=6, n_rec_pad=24, n_lig_pad=10, n_kp=24,
                          kp_feat_dim=10)
    tcfg = TrainConfig(grad_accum=4, scheduler=SchedulerConfig(base_lr=1e-4))
    opt = make_optimizer(tcfg)
    state = init_train_state(model, opt, jax.random.key(6), cpx)
    step = make_train_step(model, tcfg, opt, iters_per_epoch=10)
    with pytest.raises(ValueError, match="grad_accum"):
        step(state, jax.random.key(7), cpx)

"""Training driver: optax optimizer, jitted data-parallel train step,
orbax checkpoints, metric logging.

Optimization matches the reference recipe (train.py:430-448,531-543):
Adam with torch-style coupled weight decay (L2 added to the gradient
BEFORE the Adam moments — torch.optim.Adam semantics, not AdamW),
elementwise gradient value clipping at clip_value, loss =
l2 + w_rec * rec_encoder (+ w_rl * rl_hinge).

Scaling (absent in the single-GPU reference, SURVEY.md §2.4): the train
step is jitted with the batch pytree sharded over a 'data' mesh axis and
params replicated; XLA's SPMD partitioner inserts the gradient psum over
ICI automatically.
"""
from __future__ import annotations

import dataclasses
import pickle
import time
from pathlib import Path
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from kpdiff_tpu.models.diffusion import KeypointDiffusion
from kpdiff_tpu.parallel.mesh import batch_sharding, replicated
from kpdiff_tpu.training.scheduler import SchedulerConfig, learning_rate, rec_encoder_weight


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 1e-12
    clip_grad: bool = True
    clip_value: float = 1.5
    batch_size: int = 32
    epochs: int = 3
    rec_encoder_loss_weight: float = 0.1
    rl_hinge_loss_weight: float = 0.0
    # split each batch into grad_accum sequential micro-batches inside the
    # jitted step (lax.scan), averaging micro-gradients before the optimizer
    # update. Peak HBM is ONE micro-batch's backward + a param-sized grad
    # accumulator — reference-scale effective batches on a 16G chip (the
    # egnn/gvp_all_atom configs OOM at batch 32 even remat'd; measured with
    # benchmarks/train_memory.py). Standard grad-accum semantics: each
    # micro-batch's loss keeps its own atom-count normalizers, so this
    # equals the full-batch gradient exactly when the micro normalizers
    # match, and the usual micro-mean otherwise.
    grad_accum: int = 1
    scheduler: SchedulerConfig = dataclasses.field(default_factory=SchedulerConfig)


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar


def make_optimizer(cfg: TrainConfig):
    """Adam + coupled (torch-style) weight decay + value clipping.

    LR is injected per-step via optax.inject_hyperparams so the reference's
    manual warmup/restart scheduler (scheduler.py:42-62) can drive it from
    inside the jitted step.
    """
    chain = []
    if cfg.clip_grad:
        chain.append(optax.clip(cfg.clip_value))  # clip grad VALUES (train.py:541-542)
    if cfg.weight_decay:
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
    chain.append(optax.inject_hyperparams(optax.adam)(learning_rate=cfg.learning_rate))
    return optax.chain(*chain)


def _set_lr(opt_state, lr):
    """Overwrite the injected learning_rate hyperparam in the optax chain state."""
    new = []
    for node in opt_state:
        if hasattr(node, "hyperparams") and "learning_rate" in getattr(node, "hyperparams", {}):
            hp = dict(node.hyperparams)
            hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
            node = node._replace(hyperparams=hp)
        new.append(node)
    return tuple(new)


def make_train_step(
    model: KeypointDiffusion,
    cfg: TrainConfig,
    optimizer,
    iters_per_epoch: int,
    mesh=None,
    kp_axis: Optional[str] = None,
    with_t_eps: bool = False,
):
    """Returns a jitted (state, rng, batch) -> (state, metrics) step.

    kp_axis: name of a mesh axis to shard the KEYPOINT dimension over
    (dp x mp training, parallel/kp_shard.py::kp_constraint_fn) — the
    dynamics' pair grids and their gradients row-shard across it while
    the batch stays on 'data'.

    with_t_eps: batch becomes (cpx, (t_ints, eps_x, eps_h)) and the noise
    override is forwarded to model.loss — the trajectory-parity seam
    (tests/test_train_trajectory.py runs N optimizer steps of the
    reference's train loop, train.py:520-543, on identical injected
    noise). Training never sets it."""
    sched = cfg.scheduler

    kp_constraint = None
    if kp_axis is not None:
        if mesh is None or kp_axis not in mesh.axis_names:
            raise ValueError(f"kp_axis={kp_axis!r} requires a mesh with that axis")
        from kpdiff_tpu.parallel.kp_shard import kp_constraint_fn

        kp_constraint = kp_constraint_fn(mesh, axis=kp_axis)

    def step_fn(state: TrainState, rng, batch):
        t_eps = None
        if with_t_eps:
            batch, t_eps = batch
        epoch_exact = state.step.astype(jnp.float32) / iters_per_epoch
        w_rec = rec_encoder_weight(sched, epoch_exact)
        lr = learning_rate(sched, epoch_exact)

        def full_loss(params, rng_i, mb, te):
            losses = model.loss(params, rng_i, mb, t_eps_override=te,
                                kp_constraint=kp_constraint)
            total = losses["l2"] + w_rec * losses["rec_encoder"]
            if "rl_hinge" in losses:
                total = total + cfg.rl_hinge_loss_weight * losses["rl_hinge"]
            return total, losses

        accum = max(int(getattr(cfg, "grad_accum", 1) or 1), 1)
        if accum == 1:
            (total, losses), grads = jax.value_and_grad(full_loss, has_aux=True)(
                state.params, rng, batch, t_eps)
        else:
            # sequential micro-batches: reshape (B, ...) -> (A, B//A, ...) and
            # scan, so only one micro backward is live at a time
            def to_micro(x):
                if x.shape[0] % accum:
                    raise ValueError(
                        f"grad_accum={accum} must divide batch {x.shape[0]}")
                return x.reshape((accum, x.shape[0] // accum) + x.shape[1:])

            mb_batch = jax.tree_util.tree_map(to_micro, batch)
            mb_te = (None if t_eps is None
                     else jax.tree_util.tree_map(to_micro, t_eps))
            keys = jax.random.split(rng, accum)

            micro0 = jax.tree_util.tree_map(lambda x: x[0], mb_batch)
            te0 = (None if mb_te is None
                   else jax.tree_util.tree_map(lambda x: x[0], mb_te))
            _, loss_shapes = jax.eval_shape(full_loss, state.params, keys[0], micro0, te0)
            zeros = (
                jax.tree_util.tree_map(lambda p: jnp.zeros(p.shape, p.dtype), state.params),
                jnp.zeros((), jnp.float32),
                jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), loss_shapes),
            )

            def body(acc, xs):
                g_acc, tot_acc, loss_acc = acc
                key_i, mb = xs[0], xs[1]
                te = xs[2] if len(xs) > 2 else None
                (tot_i, losses_i), g_i = jax.value_and_grad(
                    full_loss, has_aux=True)(state.params, key_i, mb, te)
                return (jax.tree_util.tree_map(jnp.add, g_acc, g_i),
                        tot_acc + tot_i,
                        jax.tree_util.tree_map(jnp.add, loss_acc, losses_i)), None

            xs = (keys, mb_batch) if mb_te is None else (keys, mb_batch, mb_te)
            (g_sum, tot_sum, loss_sum), _ = jax.lax.scan(body, zeros, xs)
            inv = 1.0 / accum
            grads = jax.tree_util.tree_map(lambda g: g * inv, g_sum)
            total = tot_sum * inv
            losses = jax.tree_util.tree_map(lambda v: v * inv, loss_sum)

        opt_state = _set_lr(state.opt_state, lr)
        updates, opt_state_new = optimizer.update(grads, opt_state, state.params)
        params_new = optax.apply_updates(state.params, updates)

        # failure recovery (SURVEY §5.3): a sporadic non-finite loss/grad
        # (observed ~1 per few-thousand steps in long runs) must not poison
        # the params — skip the update for that batch, keep optimizer state
        # as-is, and report it. jnp.where keeps the pytree structures
        # identical, so checkpoints stay compatible.
        finite = jnp.isfinite(total)
        for g in jax.tree_util.tree_leaves(grads):
            finite = finite & jnp.all(jnp.isfinite(g))

        def keep_finite(new, old):
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(finite, n, o) if isinstance(n, jnp.ndarray) else n,
                new, old)

        params = keep_finite(params_new, state.params)
        opt_state = keep_finite(opt_state_new, opt_state)

        metrics = dict(losses)
        metrics["total"] = total
        metrics["lr"] = lr
        metrics["rec_enc_weight"] = w_rec
        metrics["skipped_nonfinite"] = 1.0 - finite.astype(jnp.float32)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    rep = replicated(mesh)
    data = batch_sharding(mesh)
    # single shardings broadcast as pytree prefixes over each argument
    return jax.jit(
        step_fn,
        in_shardings=(rep, rep, data),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def init_train_state(model: KeypointDiffusion, optimizer, rng, example_batch) -> TrainState:
    params = model.init(rng, example_batch)
    opt_state = optimizer.init(params)
    return TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32))


# --------------------------------------------------------------------------
# checkpointing (reference: torch.save of the bare state_dict only,
# utils.py:65-66 — optimizer moments were lost on resume. Here orbax saves
# the full TrainState including opt_state; SURVEY.md §5.4 gap fixed.)
# --------------------------------------------------------------------------

def save_checkpoint(ckpt_dir: Path, state: TrainState, step: Optional[int] = None):
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    step = int(state.step) if step is None else step
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(ckpt_dir / f"step_{step}", state, force=True)


def load_checkpoint(ckpt_dir: Path, target: TrainState, step: Optional[int] = None) -> TrainState:
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).absolute()
    if step is None:
        steps = sorted(int(p.name.split("_")[1]) for p in ckpt_dir.glob("step_*"))
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
        step = steps[-1]
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(ckpt_dir / f"step_{step}", target)


class MetricsLog:
    """Append-mode pickle metrics log (reference train_metrics.pkl /
    test_metrics.pkl, train.py:390-393,586-588,622-624)."""

    def __init__(self, path: Path):
        self.path = Path(path)
        # resume-safe: keep prior rows instead of truncating the run's
        # history (a round-3 resume wiped the first 130 epochs of metrics)
        self.rows = []
        if self.path.exists():
            try:
                with open(self.path, "rb") as f:
                    self.rows = list(pickle.load(f))
            except Exception:
                pass
        self._t0 = time.time()
        if self.rows:
            self._t0 -= float(self.rows[-1].get("time_passed", 0.0))

    def append(self, **row):
        row.setdefault("time_passed", time.time() - self._t0)
        self.rows.append({k: (float(v) if hasattr(v, "item") else v) for k, v in row.items()})
        with open(self.path, "wb") as f:
            pickle.dump(self.rows, f)

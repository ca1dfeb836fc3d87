"""Training CLI — reference train.py equivalent.

    python -m kpdiff_tpu.cli.train --config configs/egnn_40kp.yml
    python -m kpdiff_tpu.cli.train --config ... --synthetic 64   # no dataset needed
    python -m kpdiff_tpu.cli.train --resume runs/<run_dir>

Differences from the reference driver (train.py:31-648), by design:
  * data-parallel over all visible devices via a 'data' mesh (reference is
    single-GPU);
  * orbax checkpoints include optimizer state (reference loses Adam
    moments on resume);
  * wandb is optional and absent in this environment — metrics go to
    train_metrics.pkl / test_metrics.pkl and stdout, same artifacts as the
    reference (train.py:390-393).
"""
from __future__ import annotations

import argparse
import time
import uuid
from pathlib import Path

import numpy as np
import yaml


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--resume", type=str, default=None, help="run dir to resume from")
    p.add_argument("--synthetic", type=int, default=0, help="train on N synthetic complexes (smoke/benchmark)")
    p.add_argument("--synthetic_mol", type=int, default=0,
                   help="train on N molecule-like synthetic complexes (data/molgen.py; "
                        "learnable structure for trained-model demonstrations)")
    p.add_argument("--epochs", type=float, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--dataset_size", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--n_devices", type=int, default=0, help="0 = all visible devices")
    p.add_argument("--mp_devices", type=int, default=1,
                   help="> 1 trains on a dp x mp mesh: the keypoint axis (and "
                        "with it the dynamics' pair grids + gradients) shards "
                        "over this many devices while the batch stays "
                        "data-parallel (parallel/kp_shard.py); must divide "
                        "n_devices, and n_keypoints must divide it")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler device trace of steps 10-15 to this dir")
    p.add_argument(
        "--set", action="append", default=[], metavar="SECTION.KEY=VALUE",
        help="override any nested config key (replaces the reference's ~50 "
             "per-key sweep flags, train.py:31-306), e.g. --set dynamics.n_layers=4",
    )
    return p.parse_args(argv)


def apply_overrides(config, overrides):
    import ast

    for ov in overrides:
        path, _, raw = ov.partition("=")
        keys = path.strip().split(".")
        node = config
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        node[keys[-1]] = value
    return config


def main(argv=None):
    args = parse_args(argv)

    import jax

    from kpdiff_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from kpdiff_tpu.config import PaddingConfig, load_config, model_from_config, resolve_feature_sizes
    from kpdiff_tpu.data.dataset import ComplexDataset, PaddedLoader, synthetic_dataset
    from kpdiff_tpu.parallel.mesh import make_mesh, shard_batch_pytree
    from kpdiff_tpu.training.scheduler import SchedulerConfig, is_restart_boundary
    from kpdiff_tpu.training.trainer import (
        MetricsLog,
        TrainConfig,
        init_train_state,
        load_checkpoint,
        make_optimizer,
        make_train_step,
        save_checkpoint,
    )

    if args.resume:
        run_dir = Path(args.resume)
        config = load_config(run_dir / "config.yml")
        config = apply_overrides(config, args.set)
    else:
        config = load_config(args.config)
        config = apply_overrides(config, args.set)  # before run_dir so experiment.* overrides apply
        name = config.get("experiment", {}).get("name", "run")
        results_dir = Path(config.get("experiment", {}).get("results_dir", "runs/"))
        run_dir = results_dir / f"{name}_{time.strftime('%Y%m%d_%H%M%S')}_{uuid.uuid4().hex[:4]}"
        run_dir.mkdir(parents=True, exist_ok=True)

    tr = config.get("training", {})
    if args.epochs is not None:
        tr["epochs"] = args.epochs
    if args.batch_size is not None:
        tr["batch_size"] = args.batch_size
    if args.learning_rate is not None:
        tr["learning_rate"] = args.learning_rate
    if args.dataset_size is not None:
        config.setdefault("dataset", {})["dataset_size"] = args.dataset_size

    if not args.resume:
        with open(run_dir / "config.yml", "w") as f:
            yaml.safe_dump(config, f)

    model = model_from_config(config)
    pad = PaddingConfig.from_config(config)
    n_rec_feat, n_lig_feat, n_kp_feat = resolve_feature_sizes(config)

    # ---- dataset
    ds_cfg = config["dataset"]
    if args.synthetic_mol:
        from kpdiff_tpu.data.molgen import molgen_splits_for_config

        train_ds, test_ds = molgen_splits_for_config(
            config, pad, n_rec_feat, args.synthetic_mol, args.seed)
    elif args.synthetic:
        rec_range = (min(24, pad.n_rec // 2), pad.n_rec)
        lig_range = (min(8, max(pad.n_lig // 2, 2)), pad.n_lig)
        train_ds = synthetic_dataset(args.synthetic, seed=args.seed, n_rec_feat=n_rec_feat,
                                     n_lig_feat=len(ds_cfg["lig_elements"]),
                                     rec_range=rec_range, lig_range=lig_range)
        test_ds = synthetic_dataset(max(args.synthetic // 4, 4), seed=args.seed + 1,
                                    n_rec_feat=n_rec_feat, n_lig_feat=len(ds_cfg["lig_elements"]),
                                    rec_range=rec_range, lig_range=lig_range)
    else:
        loc = Path(ds_cfg["location"])
        train_ds = ComplexDataset.from_pickle(loc / "train.pkl")
        test_ds = ComplexDataset.from_pickle(loc / "val.pkl")

    kp_vec_dim = None
    if model.cfg.architecture == "gvp":
        kp_vec_dim = model.cfg.rec_encoder.get("vector_size", 16)

    # bucketed ligand padding (SURVEY §7.1 point 2): pad each complex to the
    # smallest bucket that fits instead of the full capacity; 'auto' derives
    # buckets from the training split's size distribution
    from kpdiff_tpu.data.dataset import resolve_lig_buckets

    lig_buckets = resolve_lig_buckets(config, train_ds, pad.n_lig)

    def loader(ds, seed, drop_last=True):
        return PaddedLoader(
            ds, pad, batch_size=tr.get("batch_size", 32),
            n_kp=pad.n_kp, kp_feat_dim=model.cfg.rec_nf, kp_vec_dim=kp_vec_dim,
            max_fake_atom_frac=ds_cfg.get("max_fake_atom_frac", 0.0), seed=seed,
            drop_last=drop_last, lig_buckets=lig_buckets,
        )

    train_loader = loader(train_ds, args.seed)
    test_loader = loader(test_ds, args.seed + 7, drop_last=False)

    iters_per_epoch = max(len(train_ds) // tr.get("batch_size", 32), 1)

    sched_cfg = tr.get("scheduler", {})
    tcfg = TrainConfig(
        learning_rate=tr.get("learning_rate", 1e-4),
        weight_decay=tr.get("weight_decay", 1e-12),
        clip_grad=tr.get("clip_grad", True),
        clip_value=tr.get("clip_value", 1.5),
        batch_size=tr.get("batch_size", 32),
        epochs=tr.get("epochs", 3),
        rec_encoder_loss_weight=tr.get("rec_encoder_loss_weight", 0.1),
        rl_hinge_loss_weight=tr.get("rl_hinge_loss_weight", 0.0),
        grad_accum=int(tr.get("grad_accum", 1) or 1),
        scheduler=SchedulerConfig(
            base_lr=tr.get("learning_rate", 1e-4),
            warmup_length=sched_cfg.get("warmup_length", 0),
            restart_interval=sched_cfg.get("restart_interval", 0),
            restart_type=sched_cfg.get("restart_type", "cosine"),
            rec_enc_loss_weight=tr.get("rec_encoder_loss_weight", 0.1),
            rec_enc_weight_decay_midpoint=sched_cfg.get("rec_enc_weight_decay_midpoint", 0),
            rec_enc_weight_decay_scale=sched_cfg.get("rec_enc_weight_decay_scale", 1),
        ),
    )

    optimizer = make_optimizer(tcfg)
    example = next(iter(train_loader.epoch()))
    state = init_train_state(model, optimizer, jax.random.key(args.seed), example)

    if args.resume:
        state = load_checkpoint(run_dir / "checkpoints", state)
        print(f"resumed from step {int(state.step)}", flush=True)

    n_dev = args.n_devices or len(jax.devices())
    kp_axis = None
    if args.mp_devices > 1:
        # dp x mp: batch on 'data', keypoint axis on 'model'
        # (parallel/kp_shard.py::kp_constraint_fn inside the jitted loss)
        if n_dev % args.mp_devices:
            raise SystemExit(f"--mp_devices {args.mp_devices} must divide the "
                             f"device count {n_dev}")
        mesh = make_mesh(n_dev, axis_names=("data", "model"),
                         axis_sizes=(n_dev // args.mp_devices, args.mp_devices))
        kp_axis = "model"
    else:
        mesh = make_mesh(n_dev) if n_dev > 1 else None
    step_fn = make_train_step(model, tcfg, optimizer, iters_per_epoch, mesh=mesh,
                              kp_axis=kp_axis)

    train_log = MetricsLog(run_dir / "train_metrics.pkl")
    test_log = MetricsLog(run_dir / "test_metrics.pkl")
    ckpt_dir = run_dir / "checkpoints"

    # optional wandb (reference train.py:369-376,594-601); silently disabled
    # when the package is absent or mode == disabled
    wandb_run = _init_wandb(config)

    # in-training molecule-quality analyzer (reference ModelAnalyzer,
    # train.py:555-572) — sampled at sample_interval fractional epochs
    from kpdiff_tpu.analysis.analyzer import ModelAnalyzer

    samp_cfg = config.get("sampling_config", {})
    # training-split atom-type histogram -> analyzer KL metric (reference
    # LigandTypeDistribution, metrics.py:211-236)
    from kpdiff_tpu.data.molgen import type_counts as _type_counts

    analyzer = ModelAnalyzer(
        model, test_ds, pad, lig_elements=ds_cfg["lig_elements"],
        n_receptors=min(samp_cfg.get("n_receptors", 2), 8),
        n_replicates=min(samp_cfg.get("n_replicates", 4), 12),
        train_type_counts=_type_counts(train_ds),
        seed=args.seed + 11,
        diff_batch_size=samp_cfg.get("diff_batch_size", 0),
    )
    sample_interval = tr.get("sample_interval", 0)
    # fire once at epoch ~0 so the run records the UNTRAINED molecule-metric
    # baseline the later rows are compared against
    last_sample_marker = -sample_interval if sample_interval else 0.0

    rng = jax.random.key(args.seed + 1)
    test_interval = tr.get("test_interval", 1)
    save_interval = tr.get("save_interval", 1)
    metrics_interval = tr.get("train_metrics_interval", 0.1)
    last_test_marker = last_save_marker = last_metrics_marker = 0.0
    prev_epoch = 0.0
    nonfinite_streak = 0
    dropped_warned = False

    n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(state.params))
    print(f"run dir: {run_dir}; params: {n_params:,}; devices: {n_dev}; iters/epoch: {iters_per_epoch}", flush=True)

    epochs = tr.get("epochs", 3)
    t0 = time.time()
    done = False
    from kpdiff_tpu.data.prefetch import prefetch

    while not done:
        for batch in prefetch(train_loader.epoch(), depth=2):
            epoch_exact = float(state.step) / iters_per_epoch
            if epoch_exact >= epochs:
                done = True
                break
            if mesh is not None:
                batch = shard_batch_pytree(batch, mesh)
            # optional device trace over a few steady-state steps (SURVEY §5.1)
            if args.profile_dir and int(state.step) == 10:
                jax.profiler.start_trace(args.profile_dir)
            if args.profile_dir and int(state.step) == 15:
                jax.profiler.stop_trace()
                print(f"device trace written to {args.profile_dir}", flush=True)

            rng, k = jax.random.split(rng)
            state, metrics = step_fn(state, k, batch)

            # failure detection + recovery (SURVEY §5.3): the train step
            # SKIPS non-finite updates (trainer.py keep_finite), so a
            # sporadic bad batch is a logged non-event. Persistent
            # non-finite losses mean the run is actually broken — halt
            # after a streak, WITHOUT saving (a poisoned halt-checkpoint
            # measured 491 NaN leaves in an earlier run); resume from the
            # newest periodic checkpoint.
            if metrics.get("skipped_nonfinite") is not None and float(metrics["skipped_nonfinite"]) > 0:
                nonfinite_streak += 1
                print(f"  WARNING: non-finite loss/grad at step {int(state.step)}; "
                      f"update skipped (streak {nonfinite_streak})", flush=True)
            else:
                nonfinite_streak = 0
            if nonfinite_streak >= 10:
                steps = sorted(int(p.name.split("_")[1]) for p in ckpt_dir.glob("step_*"))
                last_good = f"step_{steps[-1]}" if steps else "none"
                raise RuntimeError(
                    f"10 consecutive non-finite losses ending at step {int(state.step)}; "
                    f"state NOT saved — resume from {ckpt_dir}/{last_good}"
                )

            if epoch_exact - last_metrics_marker >= metrics_interval:
                last_metrics_marker = epoch_exact
                row = {k_: float(v) for k_, v in metrics.items()}
                row["epoch"] = epoch_exact
                train_log.append(**row)
                if wandb_run:
                    wandb_run.log({f"train_{k_}": v for k_, v in row.items()}, step=int(state.step))
                print(
                    f"epoch {epoch_exact:7.2f} step {int(state.step):6d} "
                    f"l2 {row['l2']:.4f} pos {row['pos']:.4f} feat {row['feat']:.4f} "
                    f"rec {row['rec_encoder']:.4f} lr {row['lr']:.2e} "
                    f"({time.time() - t0:.0f}s)",
                    flush=True,
                )

            if epoch_exact - last_test_marker >= test_interval:
                last_test_marker = epoch_exact
                test_row = evaluate(model, state.params, test_loader, rng,
                                    test_epochs=tr.get("test_epochs", 1))
                test_row["epoch"] = epoch_exact
                test_log.append(**test_row)
                print(f"  test: {test_row}", flush=True)

            if sample_interval and epoch_exact - last_sample_marker >= sample_interval:
                last_sample_marker = epoch_exact
                rng, k = jax.random.split(rng)
                mol_metrics = analyzer.sample_and_analyze(state.params, k)
                mol_metrics["epoch"] = epoch_exact
                test_log.append(**{f"mol_{k_}": v for k_, v in mol_metrics.items()})
                print(f"  molecules: {mol_metrics}", flush=True)

            if epoch_exact - last_save_marker >= save_interval:
                last_save_marker = epoch_exact
                save_checkpoint(ckpt_dir, state)

            if is_restart_boundary(tcfg.scheduler, prev_epoch, epoch_exact):
                save_checkpoint(ckpt_dir, state)  # scheduler.py:60-62 behavior
            prev_epoch = epoch_exact

        # padding-capacity drops are data loss and must be LOUD, not silent
        # (a molgen ca_only bug once shed 60% of a split this way)
        if train_loader.n_dropped and not dropped_warned:
            dropped_warned = True
            print(f"  WARNING: {train_loader.n_dropped}/{len(train_ds)} training complexes "
                  f"exceed padding capacity (n_lig={pad.n_lig}, n_rec={pad.n_rec}, "
                  f"n_ip={pad.n_ip}) and were dropped", flush=True)

    # final held-out eval + checkpoint (reference saves at the end, train.py:643-645)
    final_epoch = float(state.step) / iters_per_epoch
    test_row = evaluate(model, state.params, test_loader, rng,
                        test_epochs=tr.get("test_epochs", 1))
    test_row["epoch"] = final_epoch
    test_log.append(**test_row)
    print(f"  final test: {test_row}", flush=True)
    save_checkpoint(ckpt_dir, state)
    print(f"done at step {int(state.step)}; final checkpoint saved to {ckpt_dir}", flush=True)
    return run_dir, state


def _init_wandb(config):
    wb_cfg = config.get("wandb", {})
    init_kwargs = dict(wb_cfg.get("init_kwargs", {}) or {})
    if init_kwargs.get("mode", "disabled") == "disabled":
        return None
    try:
        import wandb
    except ImportError:
        print("wandb not installed; metrics go to pickle logs only", flush=True)
        return None
    return wandb.init(config=config, **init_kwargs)


def evaluate(model, params, test_loader, rng, test_epochs=1, max_batches=None):
    """Held-out loss eval over `test_epochs` full passes of the test split
    (reference test_model, train.py:312-358; trained configs use 1-3).
    The jitted loss is hoisted once per model so batches don't retrace."""
    import jax

    step = getattr(model, "_eval_loss_jit", None)
    if step is None:
        step = jax.jit(model.loss)
        model._eval_loss_jit = step

    sums, n = {}, 0
    for _ in range(max(int(test_epochs), 1)):
        for batch in test_loader.epoch():
            rng, k = jax.random.split(rng)
            losses = step(params, k, batch)
            for key, v in losses.items():
                sums[key] = sums.get(key, 0.0) + float(v)
            n += 1
            if max_batches is not None and n >= max_batches:
                return {f"test_{k}": v / max(n, 1) for k, v in sums.items()}
    return {f"test_{k}": v / max(n, 1) for k, v in sums.items()}


if __name__ == "__main__":
    main()

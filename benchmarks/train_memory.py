"""AOT HBM-requirement analysis of the training step — no chip execution.

The axon remote-compile service is chipless (TpuAotCompiler), so a train
step can be lowered with abstract (ShapeDtypeStruct) inputs and compiled
for the v5e topology while the real chip is busy training: .compile() +
memory_analysis() report the exact program HBM requirement and, on OOM,
the compiler error carries the largest-allocations dump. This is how the
all_atom batch-size ceilings are measured (BASELINE.md round-4) without
stopping a resident run.

Usage: python benchmarks/train_memory.py <config> [--batch N] [--bucket N]
       [--set k=v ...]    (e.g. --set dynamics.remat=false)
Prints one JSON line per (config, batch).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/kpdiff_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def analyze(config, batch, bucket=None, overrides=()):
    import numpy as np

    from kpdiff_tpu.config import PaddingConfig, load_config, model_from_config
    from kpdiff_tpu.models.complex import synthetic_batch
    from kpdiff_tpu.training.trainer import TrainConfig, make_optimizer, make_train_step  # noqa: E501

    cfg = load_config(f"configs/{config}.yml")
    for ov in overrides:
        k, _, v = ov.partition("=")
        sect, _, key = k.partition(".")
        import ast
        try:
            v = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            pass
        cfg.setdefault(sect, {})[key] = v
    model = model_from_config(cfg)
    pad = PaddingConfig.from_config(cfg)
    n_lig = bucket or pad.n_lig
    kpv = (cfg.get("dynamics_gvp", {}).get("vector_size", 16)
           if cfg["diffusion"]["architecture"] == "gvp" else None)

    # tiny CONCRETE batch only to trace the pytree STRUCTURE; the lowered
    # step uses abstract avals of the full shapes, so nothing executes
    cpx = synthetic_batch(
        0, batch=batch, n_rec_pad=pad.n_rec, n_lig_pad=n_lig, n_rec_feat=10,
        n_lig_feat=10, n_kp=pad.n_kp, kp_feat_dim=model.cfg.rec_nf,
        kp_vec_dim=kpv, n_ip_pad=pad.n_ip, min_rec=260, min_lig=min(18, n_lig - 2),
        min_sep=1.8,
    )
    tc = TrainConfig(grad_accum=int(cfg.get("training", {}).get("grad_accum", 1) or 1))
    opt = make_optimizer(tc)
    step = make_train_step(model, tc, opt, iters_per_epoch=128)

    # abstract everything: state via eval_shape, inputs via ShapeDtypeStruct
    from kpdiff_tpu.training.trainer import init_train_state

    key = jax.random.key(0)
    state_shapes = jax.eval_shape(lambda r, c: init_train_state(model, opt, r, c),
                                  key, cpx)
    rng_shape = jax.ShapeDtypeStruct(key.shape, key.dtype)
    cpx_shapes = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), cpx)

    lowered = jax.jit(step).lower(state_shapes, rng_shape, cpx_shapes)
    row = {"config": config, "batch": batch, "n_lig": n_lig,
           **({"overrides": list(overrides)} if overrides else {})}
    try:
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        row.update(
            ok=True,
            hbm_gb=round((ma.argument_size_in_bytes + ma.temp_size_in_bytes
                          + ma.output_size_in_bytes) / 2**30, 2),
            args_gb=round(ma.argument_size_in_bytes / 2**30, 2),
            temp_gb=round(ma.temp_size_in_bytes / 2**30, 2),
            output_gb=round(ma.output_size_in_bytes / 2**30, 2),
        )
    except Exception as e:  # compile OOM carries the allocation dump
        msg = str(e)
        row["ok"] = False
        import re
        m = re.search(r"Used ([\d.]+[GM]) of ([\d.]+[GM]) hbm", msg)
        if m:
            row["used"] = m.group(1)
            row["capacity"] = m.group(2)
        # top allocations, compacted
        allocs = re.findall(r"Size: ([\d.]+[GMK])\n\s+Shape: (\S+)\n(?:.*\n)*?\s+XLA label: (\S+)", msg)
        row["top_allocs"] = [{"size": s, "shape": sh, "label": lb[:60]}
                             for s, sh, lb in allocs[:8]]
        if not allocs:
            row["error"] = msg[:400]
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--batch", type=int, action="append", default=None)
    ap.add_argument("--bucket", type=int, default=None)
    ap.add_argument("--set", action="append", default=[], metavar="SECT.KEY=V")
    args = ap.parse_args()
    for b in args.batch or [16, 32, 64]:
        print(json.dumps(analyze(args.config, b, args.bucket, tuple(args.set))),
              flush=True)


if __name__ == "__main__":
    main()

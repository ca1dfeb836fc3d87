"""Chipless AOT analysis of the compiled SAMPLER step — no chip execution.

Same trick as train_memory.py (the axon remote-compile service is
chipless): lower model.sample with fully abstract inputs (params via
eval_shape of model.init, encoder outputs via eval_shape of model.encode)
and compile for the v5e topology while the real chip is busy. Reports
memory_analysis (peak HBM, temp bytes) and cost_analysis (bytes accessed,
flops) of the whole T-step program — the discriminator for whether an
XLA-flag / scan-unroll variant reduces the scheduler's real HBM traffic
before spending chip time measuring it.

Usage: python benchmarks/sampler_memory.py <config> [--bucket N] [--batch N]
         [--steps K] [--unroll N] [--kk-cap N] [--dyn K=V ...]
TPU backend flags (xla_tpu_*) must go through KPDIFF_COMPILER_OPTS (a JSON
dict, passed per-compile as compiler_options= — same contract as
variants.py); host XLA_FLAGS cannot reach the chipless remote-compile
backend. Use --kk-cap to analyze the capped-neighbor-list kk layout that
variants.py benchmarks by default (compact_kk); without it the dense kk
from model.encode is analyzed. Prints one JSON line.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/kpdiff_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--bucket", type=int, default=32)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=0, help="sample_steps (0 = full T)")
    ap.add_argument("--unroll", type=int, default=0, help="sets KPDIFF_SCAN_UNROLL")
    ap.add_argument("--kk-cap", type=int, default=0,
                    help="analyze the compact_kk capped neighbor-list kk layout "
                         "with this cap (matches what variants.py times on chip); "
                         "0 = dense kk as returned by model.encode")
    ap.add_argument("--dyn", action="append", default=[], metavar="KEY=VALUE")
    args = ap.parse_args()
    if args.unroll:
        os.environ["KPDIFF_SCAN_UNROLL"] = str(args.unroll)

    from kpdiff_tpu.config import PaddingConfig, load_config, model_from_config
    from kpdiff_tpu.models.complex import synthetic_batch

    cfg = load_config(f"configs/{args.config}.yml")
    arch = cfg["diffusion"].get("architecture", "egnn")  # config.py defaults to egnn
    dyn_key = "dynamics_gvp" if arch == "gvp" else "dynamics"
    for ov in args.dyn:
        k, _, v = ov.partition("=")
        import ast
        try:
            v = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            pass
        cfg[dyn_key][k] = v
    model = model_from_config(cfg)
    pad = PaddingConfig.from_config(cfg)
    kpv = cfg.get("dynamics_gvp", {}).get("vector_size", 16) if arch == "gvp" else None
    cpx = synthetic_batch(
        0, batch=args.batch, n_rec_pad=pad.n_rec, n_lig_pad=args.bucket,
        n_rec_feat=10, n_lig_feat=10, n_kp=pad.n_kp, kp_feat_dim=model.cfg.rec_nf,
        kp_vec_dim=kpv, n_ip_pad=pad.n_ip, min_rec=260,
        min_lig=min(18, args.bucket - 2), min_sep=1.8,
    )
    key = jax.random.key(0)
    params_sh = jax.eval_shape(model.init, key, cpx)
    enc_sh, kk_sh = jax.eval_shape(model.encode, params_sh, cpx)
    if args.kk_cap:
        # the capped neighbor-list layout compact_kk builds (diffusion.py)
        # — abstract, with an explicit cap instead of the data-dependent
        # max-degree fetch (which needs a chip)
        from kpdiff_tpu.ops.neighbors import radius_neighbor_list

        r_kk = (model.cfg.graph_cutoffs["kk"] if model.cfg.rec_encoder_type != "fixed"
                else model.cfg.graph_cutoffs["rr"])
        kk_sh = jax.eval_shape(
            lambda x, m: radius_neighbor_list(x, m, x, m, r_kk, args.kk_cap,
                                              exclude_self=True),
            cpx.kp_x, cpx.kp_mask,
        )
    rng_sh = jax.ShapeDtypeStruct(key.shape, key.dtype)

    # TPU backend flags ride compiler_options (host XLA_FLAGS can't reach
    # the chipless remote-compile backend) — same contract as variants.py
    copts = json.loads(os.environ.get("KPDIFF_COMPILER_OPTS", "null"))
    lowered = jax.jit(
        lambda p, r, e, k: model.sample(p, r, e, k, sample_steps=args.steps)
    ).lower(params_sh, rng_sh, enc_sh, kk_sh)
    row = {"config": args.config, "bucket": args.bucket, "batch": args.batch,
           "steps": args.steps or model.cfg.n_timesteps,
           "unroll": args.unroll or 1,
           "kk": "nbr" if args.kk_cap else "dense", "kk_cap": args.kk_cap,
           "compiler_opts": copts or {},
           "xla_flags": os.environ.get("XLA_FLAGS", "")}
    compiled = lowered.compile(compiler_options=copts) if copts else lowered.compile()
    ma = compiled.memory_analysis()
    row.update(
        temp_mb=round(ma.temp_size_in_bytes / 2**20, 1),
        hbm_gb=round((ma.argument_size_in_bytes + ma.temp_size_in_bytes
                      + ma.output_size_in_bytes) / 2**30, 3),
    )
    ca = compiled.cost_analysis()
    if ca:
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        row.update(
            bytes_gb=round(ca.get("bytes accessed", 0) / 2**30, 3),
            tflops=round(ca.get("flops", 0) / 1e12, 3),
        )
    print(json.dumps(row))


if __name__ == "__main__":
    main()

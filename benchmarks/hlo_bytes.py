"""Per-instruction byte histogram of a variant's compiled sampler step.

Compiles the T=1 sampler (same protocol as benchmarks/roofline.py), walks
the optimized HLO, and reports the largest output buffers by instruction,
grouped by shape — a quick discriminator for where the HBM traffic of a
step actually goes (XLA writes each non-fused instruction's output to HBM;
inputs are reads, so big buffers dominate both directions).

Usage: python benchmarks/hlo_bytes.py <config> [--top N] [--dyn K=V]
"""
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/kpdiff_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
               "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8, "s16": 2, "u16": 2}

SHAPE_RE = re.compile(r"(f32|bf16|f16|f64|s8|u8|s16|u16|s32|u32|s64|u64|pred)\[([0-9,]*)\]")


def shape_bytes(text):
    """Sum byte sizes of every shape literal in an HLO result-type string."""
    total = 0
    for m in SHAPE_RE.finditer(text):
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--dyn", action="append", default=[], metavar="KEY=VALUE")
    args = ap.parse_args()

    from benchmarks.roofline import SHAPES
    from kpdiff_tpu.config import PaddingConfig, load_config, model_from_config
    from kpdiff_tpu.models.complex import synthetic_batch

    batch, n_lig = SHAPES[args.config]
    cfg = load_config(f"configs/{args.config}.yml")
    dyn_key = "dynamics_gvp" if cfg["diffusion"]["architecture"] == "gvp" else "dynamics"
    for ov in args.dyn:
        k, _, v = ov.partition("=")
        import ast
        try:
            v = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            pass
        cfg[dyn_key][k] = v
    cfg["diffusion"]["n_timesteps"] = 1
    model = model_from_config(cfg)
    pad = PaddingConfig.from_config(cfg)
    kpv = cfg.get("dynamics_gvp", {}).get("vector_size", 16) if cfg["diffusion"]["architecture"] == "gvp" else None
    cpx = synthetic_batch(
        0, batch=batch, n_rec_pad=pad.n_rec, n_lig_pad=n_lig, n_rec_feat=10,
        n_lig_feat=10, n_kp=pad.n_kp, kp_feat_dim=model.cfg.rec_nf,
        kp_vec_dim=kpv, n_ip_pad=pad.n_ip, min_rec=260, min_lig=min(18, n_lig - 2),
        min_sep=1.8,
    )
    params = model.init(jax.random.key(0), cpx)
    enc, kk_raw = jax.jit(model.encode)(params, cpx)
    kk = model.compact_kk(enc, kk_raw)

    compiled = jax.jit(lambda p, r, e, k: model.sample(p, r, e, k)).lower(
        params, jax.random.key(1), enc, kk).compile()
    hlo = compiled.as_text()

    # Walk instruction lines of the while-body (the scan step) and the whole
    # module; aggregate output bytes by (op kind, shape signature). Skip
    # instructions inside fusion-body computations — those never touch HBM
    # (only the fusion op's inputs/output do).
    by_group = defaultdict(lambda: [0, 0])  # group -> [count, bytes]
    inst_re = re.compile(r"^\s+(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\([^)]*\)|\S+)\s+(\w+)")
    comp_re = re.compile(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s*(?:\([^)]*\))?\s*->.*\{")
    in_fusion_body = False
    for line in hlo.splitlines():
        cm = comp_re.match(line)
        if cm:
            in_fusion_body = "fused_computation" in cm.group(1)
            continue
        if in_fusion_body:
            continue
        m = inst_re.match(line)
        if not m:
            continue
        name, rtype, op = m.groups()
        if op in ("parameter", "constant", "tuple", "get-tuple-element",
                  "bitcast", "while", "call"):
            continue
        b = shape_bytes(rtype)
        if b == 0:
            continue
        # shape signature: first shape literal in the result type
        sm = SHAPE_RE.search(rtype)
        sig = f"{op} {sm.group(0) if sm else rtype}"
        g = by_group[sig]
        g[0] += 1
        g[1] += b

    rows = sorted(by_group.items(), key=lambda kv: -kv[1][1])[: args.top]
    total = sum(v[1] for v in by_group.values())
    print(json.dumps({"config": args.config, "total_output_bytes": total}))
    for sig, (cnt, b) in rows:
        print(f"{b/1e6:10.1f} MB  x{cnt:4d}  {sig}")


if __name__ == "__main__":
    main()

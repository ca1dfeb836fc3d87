"""Op-level device-time profile of a variant's sampler step.

Traces a T=100 sampler execution with jax.profiler, parses the xplane
protobuf (tensorflow.core.profiler xplane_pb2), and prints device time
aggregated by HLO op name prefix — the discriminator for whether a step
is matmul(MXU)-, elementwise(VPU)-, gather-, or copy-bound.

Usage: python benchmarks/op_profile.py <config> [--top N] [--dyn K=V]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import glob
import json
import re
from collections import defaultdict

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/kpdiff_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def build_and_run(config, dyn, trace_dir):
    import numpy as np

    from benchmarks.roofline import SHAPES
    from kpdiff_tpu.config import PaddingConfig, load_config, model_from_config
    from kpdiff_tpu.models.complex import synthetic_batch

    batch, n_lig = SHAPES[config]
    cfg = load_config(f"configs/{config}.yml")
    dyn_key = "dynamics_gvp" if cfg["diffusion"]["architecture"] == "gvp" else "dynamics"
    for ov in dyn:
        k, _, v = ov.partition("=")
        import ast
        try:
            v = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            pass
        cfg[dyn_key][k] = v
    cfg["diffusion"]["n_timesteps"] = 100
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
    s = jax.jit(lambda p, r, e, k: model.sample(p, r, e, k))
    out = s(params, jax.random.key(1), enc, kk)
    np.asarray(out["lig_x"])  # warm up + compile
    jax.profiler.start_trace(trace_dir)
    out = s(params, jax.random.key(2), enc, kk)
    np.asarray(out["lig_x"])
    jax.profiler.stop_trace()


def parse_xplane(trace_dir, top):
    # the xplane proto moved between TF releases; try the known homes
    xplane_pb2 = None
    for path in (
        "tensorflow.tsl.profiler.protobuf.xplane_pb2",
        "tensorflow.core.profiler.protobuf.xplane_pb2",
        "xprof.protobuf.xplane_pb2",
    ):
        try:
            import importlib

            xplane_pb2 = importlib.import_module(path)
            break
        except ImportError:
            continue
    if xplane_pb2 is None:
        raise ImportError("no xplane_pb2 found in tensorflow/tsl/xprof")

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no xplane found under", trace_dir)
        return
    xspace = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        xspace.ParseFromString(f.read())

    by_op = defaultdict(float)
    total = 0.0
    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry per-op events; skip step/module summary lines
            if "xla op" not in lname and "xla ops" not in lname:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                dur = ev.duration_ps / 1e12
                by_op[name] += dur
                total += dur
    # group: strip trailing .N / numeric suffixes for aggregation
    grouped = defaultdict(float)
    for name, dur in by_op.items():
        g = re.sub(r"[.\d]+$", "", name)
        grouped[g] += dur
    rows = sorted(grouped.items(), key=lambda kv: -kv[1])[:top]
    print(json.dumps({"total_device_s": round(total, 4)}))
    for name, dur in rows:
        print(f"{dur*1e3:9.2f} ms  {100*dur/total:5.1f}%  {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--dyn", action="append", default=[], metavar="KEY=VALUE")
    ap.add_argument("--trace_dir", default=None)
    args = ap.parse_args()
    trace_dir = args.trace_dir or f"/tmp/kpdiff_trace_{args.config}"
    os.makedirs(trace_dir, exist_ok=True)
    build_and_run(args.config, args.dyn, trace_dir)
    parse_xplane(trace_dir, args.top)


if __name__ == "__main__":
    main()

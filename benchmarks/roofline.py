"""Per-variant sampling benchmark with roofline + grounded baseline accounting.

For each of the reference's 8 shipped configs (trained_models/*/config.yml),
this measures on the real chip:
  * ms/step and s/ligand (T=1000 protocol, same as benchmarks/variants.py);
  * FLOP/step and HBM bytes/step from XLA cost analysis of a T=1
    executable (XLA counts a lax.scan body ONCE regardless of trip
    count, so a T=1 program reports prologue + exactly one step; the
    prologue — prior sampling + COM removal — is negligible);
  * the chip roofline floor max(flops/peak_flops, bytes/peak_bw) and the
    measured step's % of that floor;
and derives a DOCUMENTED per-variant estimate of the reference's A100
sampling time (replacing the single assumed 1.0 s/lig; VERDICT r2 item 3):

  ref est. = T * [ max(flops_ref/19.5 TFLOP/s, bytes_ref/1.6 TB/s)
                   + launches * 8 us + rebuild ] / batch

  - flops_ref: per-edge MLP FLOPs (from the config's widths, reference
    models/dynamics.py:124-208 stack) times the reference's SPARSE edge
    counts, counted exactly on this benchmark's geometry with the
    reference's own graph rules (radius/knn cutoffs) — no padding, so
    this is the work an ideal sparse implementation does;
  - 19.5 TFLOP/s: A100 fp32 peak (torch matmul default — TF32 is off by
    default since torch 1.12); 1.6 TB/s: ~80%% of A100 HBM peak;
  - launches: DGL/eager kernel-launch count (~10 per edge type per conv:
    gather, 2-3 edge-MLP matmuls + activations, gate, scatter-aggregate,
    node/coord MLPs) at 8 us CUDA launch+DGL overhead each;
  - rebuild: per-step torch_cluster radius/knn graph rebuild of the
    ll/kl/lk graphs on batch*(n_lig+n_kp) coordinates (the reference
    rebuilds every step, models/dynamics.py), ~1 ms at these sizes.

Usage: python benchmarks/roofline.py [config ...] [--trained RUNDIR]
Writes one JSON line per variant and a summary to BENCH_VARIANTS.json.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/kpdiff_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

# (batch, lig bucket) per variant — round-2 sweep shapes (BASELINE.md)
SHAPES = {
    "egnn_20kp": (128, 32), "gvp_20kp": (128, 32),
    "egnn_40kp": (128, 32), "gvp_40kp": (128, 32),
    "egnn_ca": (64, 32), "gvp_ca": (64, 32),
    "egnn_all_atom": (32, 32), "gvp_all_atom": (32, 32),
}

# (peak bf16 FLOP/s, HBM bytes/s) by device kind substring
TPU_PEAKS = [
    ("v5e", (197e12, 819e9)), ("v5 lite", (197e12, 819e9)),
    ("v5p", (459e12, 2765e9)), ("v4", (275e12, 1228e9)),
    ("v6e", (918e12, 1640e9)), ("v6 lite", (918e12, 1640e9)),
]

A100_FP32 = 19.5e12
A100_BW = 1.6e12  # achievable of 2.0 peak
LAUNCH_US = 8.0
REBUILD_MS = 1.0

_TRANS_RATE = None  # lazily calibrated once per sweep (micro_vpu.py)


def chip_peaks():
    kind = jax.devices()[0].device_kind.lower()
    for sub, peaks in TPU_PEAKS:
        if sub in kind:
            return kind, peaks
    return kind, (197e12, 819e9)  # default: v5e


def _cost(fn, *args):
    compiled = fn.lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    mem = None
    try:  # per-device footprint of the T=1 program (serving HBM evidence)
        ma = compiled.memory_analysis()
        mem = {
            "args_bytes": int(ma.argument_size_in_bytes),
            "temp_bytes": int(ma.temp_size_in_bytes),
            "output_bytes": int(ma.output_size_in_bytes),
        }
    except Exception:
        pass
    return (float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0)),
            float(ca.get("transcendentals", 0.0)), mem)


def reference_edge_counts(cpx, model):
    """Exact sparse edge counts under the reference's graph rules on this
    geometry (radius for ll/kk, k-NN for kl/lk — models/dynamics.py:71-117)."""
    cut = model.cfg.graph_cutoffs
    lig = np.asarray(cpx.lig_x)
    lm = np.asarray(cpx.lig_mask)
    kp = np.asarray(cpx.kp_x)
    km = np.asarray(cpx.kp_mask)
    kl_k = int(model.cfg.dynamics.get("kl_k", model.cfg.dynamics.get("ll_k", 5)) or 5)
    n_ll = n_kk = n_kl = 0
    for b in range(lig.shape[0]):
        L = lig[b][lm[b]]
        K = kp[b][km[b]]
        dll = np.linalg.norm(L[:, None] - L[None], axis=-1)
        n_ll += int(((dll < cut.get("ll", 5.0)) & ~np.eye(len(L), dtype=bool)).sum())
        dkk = np.linalg.norm(K[:, None] - K[None], axis=-1)
        n_kk += int(((dkk < cut.get("kk", 8.0)) & ~np.eye(len(K), dtype=bool)).sum())
        n_kl += min(kl_k, len(K)) * len(L)  # kl kNN; lk is symmetric count
    return {"ll": n_ll, "kk": n_kk, "kl": n_kl, "lk": n_kl}


def egnn_per_edge_flops(hidden, feat, extra=1):
    """Reference EGNN conv per-edge MLP MACs*2 (models/dynamics.py:39-68):
    edge MLP (2F+extra->H, H->H), gate (H->1), coord MLP (H->H, H->1)."""
    f_in = 2 * feat + extra
    return 2 * (f_in * hidden + hidden * hidden + hidden + hidden * hidden + hidden)


def gvp_per_edge_flops(s, v, n_gvps=1):
    """GVP message per-edge: vector down/up projections (3*V*V each) plus
    scalar net ((2S+V+rbf)->S, S->S) per GVP (gvp.py reference stack)."""
    rbf = 16
    per = 2 * (3 * v * v * 2 + (2 * s + v + rbf) * s + s * s)
    return per * n_gvps


def ref_estimate(model, cpx, batch, T=1000):
    counts = reference_edge_counts(cpx, model)
    cfg = model.cfg
    if cfg.architecture == "gvp":
        s = cfg.dynamics.get("n_hidden_scalars", 128)
        v = cfg.dynamics.get("vector_size", 16)
        n_layers = cfg.dynamics.get("n_convs", 6)
        per_edge = gvp_per_edge_flops(s, v, cfg.dynamics.get("n_message_gvps", 3))
        feat_bytes = 4 * (s + 3 * v)
    else:
        hidden = cfg.dynamics.get("hidden_nf", 256)
        n_layers = cfg.dynamics.get("n_layers", 6)
        per_edge = egnn_per_edge_flops(hidden, hidden)
        feat_bytes = 4 * hidden
    edges = sum(counts.values())
    flops = n_layers * edges * per_edge
    # bytes: each edge reads both endpoint features and writes a message
    bytes_ = n_layers * edges * 3 * feat_bytes
    etypes = len([k for k, v_ in counts.items() if v_ > 0])
    launches = n_layers * etypes * 10
    step_s = (
        max(flops / A100_FP32, bytes_ / A100_BW)
        + launches * LAUNCH_US * 1e-6
        + REBUILD_MS * 1e-3
    )
    return {
        "edges": counts, "flops_per_step": flops, "launches": launches,
        "step_ms": round(step_s * 1e3, 2),
        "s_per_lig": round(step_s * T / batch, 4),
    }


def bench_variant(config, trained_run=None, reps=3, compare_kk=False, dyn_overrides=None,
                  batch_override=None, untrained=False):
    from kpdiff_tpu.config import PaddingConfig, load_config, model_from_config
    from kpdiff_tpu.models.complex import synthetic_batch

    batch, n_lig = SHAPES[config]
    if batch_override:
        batch = batch_override
    cfg = load_config(f"configs/{config}.yml")
    dyn_key = "dynamics_gvp" if cfg["diffusion"]["architecture"] == "gvp" else "dynamics"
    for ov in dyn_overrides or []:
        k, _, v = ov.partition("=")
        try:
            import ast

            v = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            pass
        cfg[dyn_key][k] = v
    model_T = cfg["diffusion"]["n_timesteps"]

    def build(T):
        c = json.loads(json.dumps(cfg))
        c["diffusion"]["n_timesteps"] = T
        return model_from_config(c)

    pad = PaddingConfig.from_config(cfg)
    kpv = cfg.get("dynamics_gvp", {}).get("vector_size", 16) if cfg["diffusion"]["architecture"] == "gvp" else None
    model100, model1 = build(100), build(1)
    # ca_only configs featurize receptors with 20 residue one-hots, not 10
    # elements — the synthetic batch must match or the trained archives'
    # first-layer shapes (kp_encoder lin0) cannot load
    from kpdiff_tpu.config import resolve_feature_sizes

    n_rec_feat, n_lig_feat, _ = resolve_feature_sizes(cfg)
    cpx = synthetic_batch(
        0, batch=batch, n_rec_pad=pad.n_rec, n_lig_pad=n_lig, n_rec_feat=n_rec_feat,
        n_lig_feat=n_lig_feat, n_kp=pad.n_kp, kp_feat_dim=model100.cfg.rec_nf,
        kp_vec_dim=kpv, n_ip_pad=pad.n_ip, min_rec=260, min_lig=min(18, n_lig - 2),
        min_sep=1.8,
    )
    params = model100.init(jax.random.key(0), cpx)
    trained_src = None
    if trained_run is not None:
        from kpdiff_tpu.training.trainer import TrainConfig, init_train_state, load_checkpoint, make_optimizer

        opt = make_optimizer(TrainConfig())
        state = init_train_state(model100, opt, jax.random.key(0), cpx)
        state = load_checkpoint(os.path.join(trained_run, "checkpoints"), state)
        params = state.params
        trained_src = trained_run
    elif trained_run is None and not dyn_overrides and not untrained:
        # default to the committed demo archives so the sweep reports the
        # trained regime reproducibly from the repo alone (bench.py does
        # the same for the flagship); --untrained/--dyn keep the raw-init
        # path for layout experiments
        npz = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "artifacts", f"{config}_trained_params.npz")
        if os.path.exists(npz):
            from kpdiff_tpu.utils.params_io import load_params_npz

            params = load_params_npz(npz, params)
            trained_src = npz
        else:
            print(f"# {config}: no trained archive ({npz}) — raw-init weights; "
                  "row will carry no 'trained' key", flush=True)

    enc, kk_raw = jax.jit(model100.encode)(params, cpx)
    kk = model100.compact_kk(enc, kk_raw)
    kk_desc = "block" if isinstance(kk, dict) else ("nbr" if isinstance(kk, tuple) else "dense")

    s100 = jax.jit(lambda p, r, e, k: model100.sample(p, r, e, k))
    s1 = jax.jit(lambda p, r, e, k: model1.sample(p, r, e, k))
    flops_step, bytes_step, trans_step, mem_step = _cost(s1, params, jax.random.key(1), enc, kk)

    out = s100(params, jax.random.key(1), enc, kk)
    np.asarray(out["lig_x"])  # force completion (axon block_until_ready no-op)
    ts = []
    for i in range(reps):
        t0 = time.time()
        out = s100(params, jax.random.key(2 + i), enc, kk)
        np.asarray(out["lig_x"])
        ts.append(time.time() - t0)
    step_ms = min(ts) / 100 * 1e3

    kind, (peak_flops, peak_bw) = chip_peaks()
    bytes_floor_ms = max(flops_step / peak_flops, bytes_step / peak_bw) * 1e3
    # VPU transcendental floor: the pair MLPs run SiLU (tanh on TPU) over
    # every pair element 4x per edge type per layer — serial VPU time the
    # bytes-only floor ignores. Rate calibrated on-chip (micro_vpu.py):
    # tanh elems/s in EXCESS of the bandwidth cost of the same passes.
    global _TRANS_RATE
    if _TRANS_RATE is None:
        from benchmarks.micro_vpu import transcendental_rate

        _TRANS_RATE = transcendental_rate()
        print(f"# calibrated tanh rate: "
              f"{'bandwidth-bound (free)' if _TRANS_RATE == float('inf') else f'{_TRANS_RATE/1e9:.1f}G elems/s'}",
              flush=True)
    vpu_floor_ms = (trans_step / _TRANS_RATE * 1e3) if _TRANS_RATE != float("inf") else 0.0
    floor_ms = max(bytes_floor_ms, vpu_floor_ms)
    # edge counts on the ENCODED complex: learned-encoder configs place
    # keypoints at runtime (enc.kp_x), the input placeholders are empty
    ref = ref_estimate(model100, enc, batch, T=model_T)

    row = {
        "config": config, "batch": batch, "n_lig": n_lig, "kk": kk_desc,
        **({"dyn_overrides": dyn_overrides} if dyn_overrides else {}),
        "T": model_T, "ms_per_step": round(step_ms, 2),
        "s_per_lig": round(step_ms * model_T / batch / 1e3, 4),
        "flops_per_step": flops_step, "bytes_per_step": bytes_step,
        "transcendentals_per_step": trans_step,
        "bytes_floor_ms": round(bytes_floor_ms, 2),
        "vpu_floor_ms": round(vpu_floor_ms, 2),
        "roofline_floor_ms": round(floor_ms, 2),
        "pct_of_floor": round(100 * floor_ms / step_ms, 1),
        "device": kind,
        **({"trained": trained_src} if trained_src else {}),
        **({"memory": mem_step} if mem_step else {}),
        "ref_est": ref,
        "speedup_vs_ref_est": round(ref["s_per_lig"] / (step_ms * model_T / batch / 1e3), 2),
    }
    if kk_desc == "nbr":
        row["kk_cap"] = int(kk[0].shape[-1])
        # measured kk degree distribution (trained-regime evidence: spread
        # keypoints -> low degree -> compact_kk engages; VERDICT r2 item 2)
        nbr_mask = np.asarray(kk[1])
        deg = nbr_mask.sum(-1)[np.asarray(enc.kp_mask)]
        row["kk_degree"] = {"mean": round(float(deg.mean()), 1), "max": int(deg.max())}
    if compare_kk and kk_desc == "nbr":
        # dense-kk timing of the SAME model/weights, for the side-by-side
        sd = jax.jit(lambda p, r, e, k: model100.sample(p, r, e, k))
        out = sd(params, jax.random.key(1), enc, kk_raw)
        np.asarray(out["lig_x"])
        tsd = []
        for i in range(reps):
            t0 = time.time()
            out = sd(params, jax.random.key(2 + i), enc, kk_raw)
            np.asarray(out["lig_x"])
            tsd.append(time.time() - t0)
        row["dense_ms_per_step"] = round(min(tsd) / 100 * 1e3, 2)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="*", default=None)
    ap.add_argument("--trained", default=None, help="run dir with checkpoints (params override)")
    ap.add_argument("--out", default="BENCH_VARIANTS.json")
    ap.add_argument("--compare_kk", action="store_true", help="also time the dense-kk layout for side-by-side")
    ap.add_argument("--dyn", action="append", default=[], metavar="KEY=VALUE",
                    help="dynamics(-gvp) config overrides, e.g. --dyn nbr_gather=onehot")
    ap.add_argument("--batch", type=int, default=None, help="override the per-variant batch size")
    ap.add_argument("--untrained", action="store_true",
                    help="skip the artifacts/<config>_trained_params.npz default (raw-init weights)")
    args = ap.parse_args()
    configs = args.configs or list(SHAPES)
    rows = []
    for c in configs:
        row = bench_variant(c, trained_run=args.trained, compare_kk=args.compare_kk, dyn_overrides=args.dyn,
                            batch_override=args.batch, untrained=args.untrained)
        print(json.dumps(row), flush=True)
        rows.append(row)
    with open(args.out, "w") as f:
        json.dump({"rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()

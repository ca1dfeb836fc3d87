"""Strided-sampling quality curve (VERDICT r2 item 6).

`--sample_steps K` runs K < T ancestral steps on a subsampled timestep
grid (models/diffusion.py:385-475; K=T reproduces the full chain
bitwise, tests/test_sampler_math.py). Speed scales ~T/K; this script
quantifies the QUALITY side on a TRAINED model: for each K it samples
the same held-out molgen pockets and reports the in-training analyzer
metrics (validity, connectivity, avg fragment fraction, uniqueness,
atom-type KL) plus measured seconds per molecule.

`--eta` additionally evaluates the generalized-DDIM sampler at each K
(eta=1 ancestral default; eta=0 deterministic DDIM — the few-step-friendly
update, models/diffusion.py sample()).

Usage: python benchmarks/strided_quality.py RUNDIR [--ks 50,100,250,1000]
       [--eta 1.0] [--n_receptors 8] [--n_replicates 12]
       [--out STRIDED_QUALITY.json]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--ks", default="50,100,250,1000")
    ap.add_argument("--eta", type=float, default=1.0,
                    help="DDIM noise scale for every row (1.0 = ancestral)")
    ap.add_argument("--params_npz", default=None,
                    help="load params from a flat-npz archive (cli.export_params "
                         "output, e.g. artifacts/*_trained_params.npz) instead of "
                         "the run dir's latest orbax checkpoint — the committed "
                         "final-step artifacts outlive pruned checkpoints")
    ap.add_argument("--n_receptors", type=int, default=8)
    ap.add_argument("--n_replicates", type=int, default=12)
    ap.add_argument("--batches", type=int, default=1,
                    help="sampling launches per K, pooled before metrics — "
                         "raises the molecule count so rate metrics carry "
                         "tight binomial CIs (demo tables report mean±CI)")
    ap.add_argument("--dataset_size", type=int, default=4096)  # train-CLI default split sizes
    ap.add_argument("--seed", type=int, default=43)
    ap.add_argument("--out", default="STRIDED_QUALITY.json")
    args = ap.parse_args()

    from kpdiff_tpu.analysis.metrics import evaluate_samples
    from kpdiff_tpu.cli.sample import _to_complex
    from kpdiff_tpu.config import PaddingConfig, load_config, model_from_config, resolve_feature_sizes
    from kpdiff_tpu.data.dataset import pad_item
    from kpdiff_tpu.data.molgen import molgen_splits_for_config, type_counts
    from kpdiff_tpu.training.trainer import TrainConfig, init_train_state, load_checkpoint, make_optimizer
    from kpdiff_tpu.models.complex import synthetic_batch

    config = load_config(os.path.join(args.run_dir, "config.yml"))
    model = model_from_config(config)
    pad = PaddingConfig.from_config(config)
    n_rec_feat, _, _ = resolve_feature_sizes(config)
    lig_elements = config["dataset"]["lig_elements"]

    # the demo runs train on molgen data (seed 42 train / 43 test in the
    # train CLI); regenerate the same split distribution — incl. ca_only
    # Cα geometry — via the shared helper
    train_ds, test_ds = molgen_splits_for_config(
        config, pad, n_rec_feat, args.dataset_size, args.seed - 1)

    kp_vec = model.cfg.rec_encoder.get("vector_size", 16) if model.cfg.architecture == "gvp" else None
    example = synthetic_batch(
        0, batch=args.n_receptors * args.n_replicates, n_rec_pad=pad.n_rec,
        n_lig_pad=pad.n_lig, n_rec_feat=n_rec_feat, n_lig_feat=model.cfg.atom_nf,
        n_kp=pad.n_kp, kp_feat_dim=model.cfg.rec_nf, kp_vec_dim=kp_vec, n_ip_pad=pad.n_ip)
    opt = make_optimizer(TrainConfig())
    state = init_train_state(model, opt, jax.random.key(0), example)
    if args.params_npz:
        from kpdiff_tpu.utils.params_io import load_params_npz

        params = load_params_npz(args.params_npz, state.params)
        step_loaded = -1
        print(f"loaded params from {args.params_npz}", flush=True)
    else:
        state = load_checkpoint(os.path.join(args.run_dir, "checkpoints"), state)
        params = state.params
        step_loaded = int(state.step)
        print(f"loaded step {step_loaded} from {args.run_dir}", flush=True)

    rng = np.random.default_rng(args.seed + 7)
    idxs = rng.choice(len(test_ds), size=args.n_receptors, replace=False)
    items = []
    for i in idxs:
        it = pad_item(test_ds.get(int(i)), pad, n_lig_feat_out=model.cfg.atom_nf)
        if it is not None:
            items.extend([it] * args.n_replicates)
    cpx = _to_complex(items, pad, model, kp_vec)

    encode = jax.jit(model.encode)
    enc, kk = encode(params, cpx)
    kk = model.compact_kk(enc, kk)
    tc = type_counts(train_ds)

    rows = []
    for K in [int(k) for k in args.ks.split(",")]:
        fn = jax.jit(lambda p, r, e, kk_, K=K: model.sample(
            p, r, e, kk_, sample_steps=K, eta=args.eta))
        out = fn(params, jax.random.key(100 + K), enc, kk)
        np.asarray(out["lig_x"])  # force
        positions, elements = [], []
        dt = 0.0
        for rep in range(args.batches):
            t0 = time.time()
            out = fn(params, jax.random.key(200 + K + 1000 * rep), enc, kk)
            lig_x, lig_h, lig_mask = map(np.asarray, (out["lig_x"], out["lig_h"], out["lig_mask"]))
            dt += time.time() - t0
            for b in range(lig_x.shape[0]):
                m = lig_mask[b]
                if m.sum() == 0:
                    continue
                feats = lig_h[b][m][:, : len(lig_elements)]
                positions.append(lig_x[b][m])
                elements.append([lig_elements[j] for j in feats.argmax(1)])
        metrics = evaluate_samples(positions, elements, train_type_counts=tc, element_list=lig_elements)
        n_mol = len(positions)
        row = {"K": K, "eta": args.eta, "n_molecules": n_mol,
               "sec_per_mol": round(dt / max(n_mol, 1), 4)}
        row.update({k: (round(v, 4) if isinstance(v, float) else v) for k, v in metrics.items()})
        # 95% binomial CIs for the rate metrics (demo tables report mean±CI).
        # uniqueness is computed over VALID molecules only (metrics.py), so
        # its CI uses that smaller sample size, not n_mol
        n_valid = max(int(round((metrics.get("validity") or 0.0) * n_mol)), 1)
        for rate, n_rate in (("validity", n_mol), ("connectivity", n_mol),
                             ("uniqueness", n_valid)):
            p_hat = metrics.get(rate)
            if isinstance(p_hat, float) and n_rate:
                row[f"{rate}_ci95"] = round(1.96 * (p_hat * (1 - p_hat) / n_rate) ** 0.5, 4)
        print(json.dumps(row), flush=True)
        rows.append(row)

    caveat = (
        "QED/SA/logP/diversity are first-party implementations (analysis/"
        "chem_props.py, analysis/sa_score.py); their rdkit-equivalence tests "
        "are gated off in rdkit-less images (verified logP anchors: 4 "
        "molecules). Within-file comparisons (K rows vs full chain) are "
        "sound; absolute values need an rdkit rerun for cross-paper claims.")
    with open(args.out, "w") as f:
        json.dump({"run_dir": args.run_dir, "step": step_loaded,
                   "params_npz": args.params_npz, "eta": args.eta,
                   "chem_props_caveat": caveat, "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()

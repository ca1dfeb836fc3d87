"""Benchmark: reverse-diffusion sampling throughput on the flagship
egnn_40kp model (learned 40-keypoint encoder + 6-layer EGNN dynamics,
T=1000 DDPM steps) — the reference's primary instrumented metric
(test.py:149,215-232: seconds per sampled ligand).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference repo publishes no numbers and its checkpoints
are stripped (BASELINE.md), so `vs_baseline` is computed against
BASELINE_SEC_PER_LIGAND below — a conservative estimate of the A100
PyTorch reference (1000 sequential python/DGL dispatch steps at batch 128;
~1 s/ligand is the right order of magnitude for the keypoint configs and
is deliberately favorable to the reference). Revisit when a real
measurement of the reference exists.
"""
from __future__ import annotations

import json
import time

BASELINE_SEC_PER_LIGAND = 1.0  # assumed A100 torch reference; see note above


def main():
    import jax

    # persistent compilation cache: the 1000-step scan costs ~10 min to
    # compile on the remote-TPU toolchain; cache makes reruns instant
    jax.config.update("jax_compilation_cache_dir", "/tmp/kpdiff_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    import jax.numpy as jnp

    from kpdiff_tpu.config import PaddingConfig, load_config, model_from_config
    from kpdiff_tpu.models.complex import synthetic_batch

    cfg = load_config("configs/egnn_40kp.yml")
    model = model_from_config(cfg)
    pad = PaddingConfig.from_config(cfg)

    batch = 128  # reference diff_batch_size / max_batch_size (test.py:29)
    # realistic sizes: ~300-atom pocket, ~30-atom ligands
    cpx = synthetic_batch(
        0, batch=batch, n_rec_pad=pad.n_rec, n_lig_pad=pad.n_lig,
        n_rec_feat=10, n_lig_feat=10, n_kp=pad.n_kp, kp_feat_dim=model.cfg.rec_nf,
        n_ip_pad=pad.n_ip, min_rec=260, min_lig=24,
    )

    params = model.init(jax.random.key(0), cpx)

    @jax.jit
    def encode_and_sample(params, rng, cpx):
        enc, kk = model.encode(params, cpx)
        return model.sample(params, rng, enc, kk)

    import numpy as np

    # warmup/compile; fetch to host to force completion — on the remote-TPU
    # backend block_until_ready does not actually block
    t0 = time.time()
    out = encode_and_sample(params, jax.random.key(1), cpx)
    np.asarray(out["lig_x"])
    compile_s = time.time() - t0

    times = []
    for i in range(3):
        t0 = time.time()
        out = encode_and_sample(params, jax.random.key(2 + i), cpx)
        np.asarray(out["lig_x"])
        times.append(time.time() - t0)

    best = min(times)
    sec_per_ligand = best / batch
    result = {
        "metric": "sample_sec_per_ligand_egnn_40kp_T1000_b128",
        "value": round(sec_per_ligand, 5),
        "unit": "s/ligand",
        "vs_baseline": round(BASELINE_SEC_PER_LIGAND / sec_per_ligand, 2),
    }
    print(json.dumps(result))
    import sys

    print(
        f"# batch={batch} T={model.cfg.n_timesteps} best_batch_s={best:.2f} "
        f"runs={[round(t, 2) for t in times]} compile_s={compile_s:.1f} "
        f"device={jax.devices()[0].device_kind}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()

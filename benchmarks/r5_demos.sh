#!/bin/bash
# Round-5 trained-demo queue — run sequentially on the single chip.
#   bash benchmarks/r5_demos.sh gvp_all_atom   # ~2h bounded short demo
#   bash benchmarks/r5_demos.sh egnn_20kp      # ~1h
#   bash benchmarks/r5_demos.sh gvp_20kp       # ~1h
# Recipes follow the committed demo runs (BASELINE.md): molgen synthetic
# data 4096/512, seed 42; all-atom keeps the reference batch-64 recipe via
# grad_accum 4 and the round-4 lesson of small analyzer diff_batch_size.
set -eu
cd "$(dirname "$0")/.."
case "$1" in
  gvp_all_atom)
    exec python -m kpdiff_tpu.cli.train --config configs/gvp_all_atom.yml \
      --synthetic_mol 4096 --seed 42 --epochs 20 \
      --set training.test_interval=2 \
      --set training.train_metrics_interval=0.2 \
      --set training.sample_interval=6 \
      --set training.save_interval=2 \
      --set sampling_config.diff_batch_size=8 \
      --set sampling_config.n_receptors=12 \
      --set sampling_config.n_replicates=8
    ;;
  egnn_20kp)
    exec python -m kpdiff_tpu.cli.train --config configs/egnn_20kp.yml \
      --synthetic_mol 4096 --seed 42 --epochs 60 \
      --set training.test_interval=3 \
      --set training.train_metrics_interval=0.5 \
      --set training.sample_interval=15 \
      --set training.save_interval=5
    ;;
  gvp_20kp)
    exec python -m kpdiff_tpu.cli.train --config configs/gvp_20kp.yml \
      --synthetic_mol 4096 --seed 42 --epochs 60 \
      --set training.test_interval=3 \
      --set training.train_metrics_interval=0.5 \
      --set training.sample_interval=15 \
      --set training.save_interval=5
    ;;
  *) echo "unknown demo $1"; exit 2;;
esac

#!/bin/bash
# Round-5 perf sweep: flagship sampler step after the fused matvec-reduce
# rewrite (models/egnn.py). Sequential — ONE process on the chip at a time.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5_perf_sweep.log}
: > "$LOG"
run() {
  echo "=== $* ===" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
run python benchmarks/variants.py egnn_40kp 32 100 128
run env KPDIFF_SCAN_UNROLL=2 python benchmarks/variants.py egnn_40kp 32 100 128
run python benchmarks/op_profile.py egnn_40kp --top 40
echo DONE >> "$LOG"

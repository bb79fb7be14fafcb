#!/bin/bash
# Round-4 queue, continuation 3 (/tmp wiped; re-run the lost measurements).
# Training matrix XLA rows first, then grad-accum, then the
# sustained-serving overhead-isolation probes. Serialized: one TPU user.
set -u
cd "$(dirname "$0")"
LOG=${LOG:-/tmp/round4_resume3.log}
: > "$LOG"

run() {
  echo "### $*" | tee -a "$LOG"
  timeout 1500 "$@" 2>&1 | tail -8 | tee -a "$LOG"
  echo | tee -a "$LOG"
}

# training matrix (verdict item 4)
run env BENCH_BACKBONE=hrnet_w48 python bench_train.py
run env BENCH_BACKBONE=hrformer_small BENCH_PALLAS=0 python bench_train.py
run env BENCH_BACKBONE=hrformer_base BENCH_PALLAS=0 BENCH_BATCH=64 BENCH_CHAIN=24 python bench_train.py
run env BENCH_BACKBONE=hrnet_w32 BENCH_ACCUM=4 python bench_train.py

# sustained-serving overhead isolation (verdict item 5)
M=python
run env PROBE_IMAGES=768 PROBE_INFLIGHT=2 $M -m infantposeestimation_gaussianbias_tpu.tools.probe_sustained
run env PROBE_IMAGES=768 PROBE_INFLIGHT=8 $M -m infantposeestimation_gaussianbias_tpu.tools.probe_sustained
run env PROBE_IMAGES=768 PROBE_INFLIGHT=2 IPE_DONATE_SERVING=1 $M -m infantposeestimation_gaussianbias_tpu.tools.probe_sustained
echo "DONE resume3" | tee -a "$LOG"

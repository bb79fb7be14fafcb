#!/bin/bash
# Round-4 queue, continuation 4: after the msa.py mixed-precision
# REVERT (keep the LayerNorm-output bf16 cast). First re-measure the
# XLA inference path (expect ~108/315 ms restored, possibly better from
# the LN cast alone), then the remaining training-matrix rows and the
# sustained-serving overhead-isolation probes.
set -u
cd "$(dirname "$0")"
LOG=${LOG:-/tmp/round4_q4.log}
: > "$LOG"

run() {
  local t="$1"; shift
  echo "### $*" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | tail -12 | tee -a "$LOG"
  echo "exit=${PIPESTATUS[0]} ---" | tee -a "$LOG"
}

M="python -m infantposeestimation_gaussianbias_tpu.tools"

# A/B leg 3: revert msa.py, keep LN cast
run 2400 env PROBE_MODELS=hrformer_small,hrformer_base python -m infantposeestimation_gaussianbias_tpu.tools.probe_hrformer

# training matrix remaining rows
run 2400 env BENCH_BACKBONE=hrformer_small BENCH_PALLAS=0 python bench_train.py
run 3000 env BENCH_BACKBONE=hrnet_w48 python bench_train.py
run 3000 env BENCH_BACKBONE=hrformer_base BENCH_PALLAS=0 BENCH_BATCH=64 BENCH_CHAIN=24 python bench_train.py
run 3000 env BENCH_BACKBONE=hrformer_base BENCH_PALLAS=1 BENCH_BATCH=64 BENCH_CHAIN=24 python bench_train.py
run 2400 env BENCH_BACKBONE=hrnet_w32 BENCH_ACCUM=4 python bench_train.py
run 1800 env BENCH_BACKBONE=litehrnet BENCH_BATCH=256 python bench_train.py

# sustained-serving overhead isolation
run 1800 env PROBE_IMAGES=768 PROBE_INFLIGHT=2 $M.probe_sustained
run 1800 env PROBE_IMAGES=768 PROBE_INFLIGHT=8 $M.probe_sustained
run 1800 env PROBE_IMAGES=768 PROBE_INFLIGHT=2 IPE_DONATE_SERVING=1 $M.probe_sustained
run 1800 env PROBE_IMAGES=768 PROBE_INFLIGHT=8 IPE_DONATE_SERVING=1 $M.probe_sustained

echo "DONE q4" | tee -a "$LOG"

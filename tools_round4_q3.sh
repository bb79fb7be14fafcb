#!/bin/bash
# Round-4 queue, continuation 3 (session restart): everything still
# pending from resume2 + followup, consolidated. Sequential on the
# 1-vCPU tunnel box; each row logs its own exit code.
set -u
cd "$(dirname "$0")"
LOG=${LOG:-/tmp/round4_q3.log}
: > "$LOG"

run() {
  local t="$1"; shift
  echo "### $*" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | tail -12 | tee -a "$LOG"
  echo "exit=${PIPESTATUS[0]} ---" | tee -a "$LOG"
}

M="python -m infantposeestimation_gaussianbias_tpu.tools"

# --- Pallas train-crash localization (fast stages first) ---
run 1800 env STAGE=kern  BACKBONE=hrformer_small BATCH=128 $M.repro_pallas_crash
run 1800 env STAGE=bbone BACKBONE=hrformer_small BATCH=128 $M.repro_pallas_crash
run 2400 env STAGE=step  BACKBONE=hrformer_small BATCH=128 $M.repro_pallas_crash

# --- mixed-precision XLA window-attention A/B (inference) ---
run 2400 env PROBE_MODELS=hrformer_small,hrformer_base python -m infantposeestimation_gaussianbias_tpu.tools.probe_hrformer

# --- training matrix remaining rows ---
run 2400 env BENCH_BACKBONE=hrformer_small BENCH_PALLAS=0 python bench_train.py
run 3000 env BENCH_BACKBONE=hrnet_w48 python bench_train.py
run 3000 env BENCH_BACKBONE=hrformer_base BENCH_PALLAS=0 BENCH_BATCH=64 BENCH_CHAIN=24 python bench_train.py
run 2400 env BENCH_BACKBONE=hrnet_w32 BENCH_ACCUM=4 python bench_train.py

# --- sustained-serving overhead isolation ---
run 1800 env PROBE_IMAGES=768 PROBE_INFLIGHT=2 $M.probe_sustained
run 1800 env PROBE_IMAGES=768 PROBE_INFLIGHT=8 $M.probe_sustained
run 1800 env PROBE_IMAGES=768 PROBE_INFLIGHT=2 IPE_DONATE_SERVING=1 $M.probe_sustained
run 1800 env PROBE_IMAGES=768 PROBE_INFLIGHT=8 IPE_DONATE_SERVING=1 $M.probe_sustained

echo "DONE q3" | tee -a "$LOG"

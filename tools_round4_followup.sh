#!/bin/bash
# Round-4 follow-up TPU batch (run AFTER tools_round4_resume2.sh):
#   1. staged localization of the PALLAS=1 train crash
#   2. re-measure the hrformer XLA path after the mixed-precision
#      window_attention change (bf16 MXU inputs, f32 accumulate/softmax)
set -u
cd "$(dirname "$0")"
LOG=${LOG:-/tmp/round4_followup.log}
: > "$LOG"

run() {
  echo "### $*" | tee -a "$LOG"
  timeout 2400 "$@" 2>&1 | tail -12 | tee -a "$LOG"
  echo "exit=$? ---" | tee -a "$LOG"
}

M="python -m infantposeestimation_gaussianbias_tpu.tools.repro_pallas_crash"
run env STAGE=kern BACKBONE=hrformer_small BATCH=128 $M
run env STAGE=bbone BACKBONE=hrformer_small BATCH=128 $M
run env STAGE=step BACKBONE=hrformer_small BATCH=128 $M

# mixed-precision XLA-path A/B (round-2 records: small 108.2 ms,
# base 315.0 ms inference b128)
run env PROBE_MODELS=hrformer_small,hrformer_base python -m infantposeestimation_gaussianbias_tpu.tools.probe_hrformer
run env BENCH_BACKBONE=hrformer_small BENCH_PALLAS=0 python bench_train.py
echo "DONE followup" | tee -a "$LOG"

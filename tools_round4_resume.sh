#!/bin/bash
# Resume the round-4 training matrix after the Pallas TPU-worker crash:
# run the XLA-path (PALLAS=0) rows first, then grad-accum. The PALLAS=1
# hrformer rows are debugged separately (tools/repro_pallas_crash.py).
set -u
cd "$(dirname "$0")"
LOG=${LOG:-/tmp/round4_resume.log}
: > "$LOG"

run() {
  echo "### $*" | tee -a "$LOG"
  timeout 2400 "$@" 2>&1 | tail -6 | tee -a "$LOG"
  echo | tee -a "$LOG"
}

run env BENCH_BACKBONE=hrformer_small BENCH_PALLAS=0 python bench_train.py
run env BENCH_BACKBONE=hrformer_base BENCH_PALLAS=0 BENCH_BATCH=64 BENCH_CHAIN=24 python bench_train.py
run env BENCH_BACKBONE=hrnet_w32 BENCH_ACCUM=4 python bench_train.py
echo "DONE resume" | tee -a "$LOG"

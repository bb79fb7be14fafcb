#!/bin/bash
# Round-4 TPU measurement queue (run sequentially; TPU executions from
# parallel processes serialize, and timing needs a quiet host).
# Usage: bash tools_round4_measure.sh [phase]
#   phase train     - training-throughput matrix across backbones (verdict #4)
#   phase sustained - sustained-serving overhead isolation (verdict #5)
set -u
cd "$(dirname "$0")"
LOG=${LOG:-/tmp/round4_measure.log}
phase=${1:-all}

run() {
  echo "### $*" | tee -a "$LOG"
  timeout 2400 "$@" 2>&1 | tail -6 | tee -a "$LOG"
  echo | tee -a "$LOG"
}

if [ "$phase" = train ] || [ "$phase" = all ]; then
  # Training matrix (BENCH.md): does MFU rise with channel width as the
  # round-3 dW-starvation negative predicts?
  run env BENCH_BACKBONE=hrnet_w32 python bench_train.py
  run env BENCH_BACKBONE=hrnet_w48 python bench_train.py
  run env BENCH_BACKBONE=hrformer_small BENCH_PALLAS=1 python bench_train.py
  run env BENCH_BACKBONE=hrformer_small BENCH_PALLAS=0 python bench_train.py
  run env BENCH_BACKBONE=hrformer_base BENCH_PALLAS=1 BENCH_BATCH=64 BENCH_CHAIN=24 python bench_train.py
  run env BENCH_BACKBONE=hrformer_base BENCH_PALLAS=0 BENCH_BATCH=64 BENCH_CHAIN=24 python bench_train.py
  # grad accumulation on the flagship (new in round 3/4)
  run env BENCH_BACKBONE=hrnet_w32 BENCH_ACCUM=4 python bench_train.py
fi

if [ "$phase" = sustained ] || [ "$phase" = all ]; then
  M=python
  # baseline (round-3 configuration)
  run env PROBE_IMAGES=768 PROBE_INFLIGHT=2 $M -m infantposeestimation_gaussianbias_tpu.tools.probe_sustained
  # (a) deferred readbacks: 8 batches in flight
  run env PROBE_IMAGES=768 PROBE_INFLIGHT=8 $M -m infantposeestimation_gaussianbias_tpu.tools.probe_sustained
  # (b) donated input buffers
  run env PROBE_IMAGES=768 PROBE_INFLIGHT=2 IPE_DONATE_SERVING=1 $M -m infantposeestimation_gaussianbias_tpu.tools.probe_sustained
  # combined
  run env PROBE_IMAGES=768 PROBE_INFLIGHT=8 IPE_DONATE_SERVING=1 $M -m infantposeestimation_gaussianbias_tpu.tools.probe_sustained
fi
echo "DONE phase=$phase" | tee -a "$LOG"

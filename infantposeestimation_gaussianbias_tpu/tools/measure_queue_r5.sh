#!/bin/bash
# Round-5 measurement queue (consolidates the former tools_round*.sh;
# serialized — one TPU user at a time).  Logs INSIDE the repo so a /tmp
# wipe cannot erase results (ADVICE r4 low #1), and every command's exit
# code is recorded so a crash is distinguishable from a skip (low #2).
set -u
cd "$(dirname "$0")/../.."
LOG=${LOG:-logs/round5_queue.log}
mkdir -p "$(dirname "$LOG")"

run() {
  echo "### $*" | tee -a "$LOG"
  timeout "${RUN_TIMEOUT:-1500}" "$@" > /tmp/run_step.out 2>&1
  rc=$?
  tail -12 /tmp/run_step.out | tee -a "$LOG"
  echo "rc=$rc" | tee -a "$LOG"
  echo | tee -a "$LOG"
}

M=python

case "${QUEUE:-all}" in
  matrix|all)
    # training-matrix completion (VERDICT r4 item 6)
    run env BENCH_BACKBONE=hrnet_w32 BENCH_ACCUM=4 $M bench_train.py
    ;;&
  sustained|all)
    # sustained-serving overhead isolation (VERDICT r4 item 4)
    run env PROBE_IMAGES=768 PROBE_INFLIGHT=2 $M -m infantposeestimation_gaussianbias_tpu.tools.probe_sustained
    run env PROBE_IMAGES=768 PROBE_INFLIGHT=8 $M -m infantposeestimation_gaussianbias_tpu.tools.probe_sustained
    run env PROBE_IMAGES=768 PROBE_INFLIGHT=2 IPE_DONATE_SERVING=1 $M -m infantposeestimation_gaussianbias_tpu.tools.probe_sustained
    ;;&
  pallas|all)
    # Pallas train-step crash diagnosis (VERDICT r4 item 2)
    run env STAGE=kern $M -m infantposeestimation_gaussianbias_tpu.tools.repro_pallas_crash
    run env STAGE=bbone $M -m infantposeestimation_gaussianbias_tpu.tools.repro_pallas_crash
    run env STAGE=step $M -m infantposeestimation_gaussianbias_tpu.tools.repro_pallas_crash
    ;;&
  decomp|all)
    # HRFormer training decomposition (VERDICT r4 item 1)
    run env PROBE_MODEL=hrformer_small $M -m infantposeestimation_gaussianbias_tpu.tools.probe_hrformer_decomp
    ;;
esac
echo "DONE queue=${QUEUE:-all}" | tee -a "$LOG"

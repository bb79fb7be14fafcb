#!/bin/bash
# Round-3 follow-up TPU measurements (after the tunnel flap): sustained
# rerun (upgraded probe with the H2D transfer leg), w48@384 retry, HTTP
# serving probe, XLA-flags A/B rerun. One TPU job at a time; between
# jobs, wait for the tunnel to accept a fresh attach (it releases the
# previous client session lazily), then give that settle client time to
# release too.
set -x
cd /root/repo

settle() {
  for i in $(seq 1 30); do
    if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      sleep 45   # let the settle client itself release
      return 0
    fi
    sleep 30
  done
  echo "settle: tunnel never came back" >&2
  return 1
}

settle
timeout 1800 python -m infantposeestimation_gaussianbias_tpu.tools.probe_sustained 2>&1 | tee /tmp/r3_sustained2.log | tail -8
settle
timeout 3600 env BENCH_INPUT=288,384 BENCH_MODEL=hrnet_w48 python bench.py 2>&1 | tee /tmp/r3_w48_384b.log | tail -4
settle
timeout 1800 python -m infantposeestimation_gaussianbias_tpu.tools.probe_serve_http 2>&1 | tee /tmp/r3_serve_http.log | tail -4
settle
timeout 7200 python -m infantposeestimation_gaussianbias_tpu.tools.probe_xla_flags 2>&1 | tee /tmp/r3_xla2.log | tail -12
echo "=== follow-up queue done ==="

#!/bin/bash
# Remaining round-3 TPU measurements: HTTP serving probe + XLA flags A/B.
set -x
cd /root/repo
settle() {
  for i in $(seq 1 30); do
    if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      sleep 45
      return 0
    fi
    sleep 30
  done
  echo "settle: tunnel never came back" >&2
  return 1
}
settle
timeout 2400 python -m infantposeestimation_gaussianbias_tpu.tools.probe_serve_http 2>&1 | tee /tmp/r3_serve_http2.log | tail -6
settle
timeout 9000 python -m infantposeestimation_gaussianbias_tpu.tools.probe_xla_flags 2>&1 | tee /tmp/r3_xla2.log | tail -12
echo "=== measure3 queue done ==="

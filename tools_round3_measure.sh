#!/bin/bash
# Round-3 TPU measurement queue — run when the axon tunnel is back.
# One TPU job at a time (parallel TPU procs serialize/corrupt timings).
# Each step logs to /tmp/r3_<name>.log; rerun-safe.
set -x
cd /root/repo

run() {  # run <name> <timeout_s> <cmd...>   (env via `env K=V` in cmd)
  local name=$1 to=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$to" "$@" 2>&1 | tee "/tmp/r3_${name}.log" | tail -20
}

# 0. Sanity: device reachable + headline bench unchanged by this round.
run bench_sanity 2400 python bench.py

# 1. Sustained overlapped serving (verdict #6 completion; pre-fix 0.62).
run sustained 3600 python -m infantposeestimation_gaussianbias_tpu.tools.probe_sustained

# 2. Small-batch serving latency sweep (BENCH_LATENCY mode, unmeasured).
run latency 3600 env BENCH_LATENCY=1 python bench.py

# 3. 384x288 serving rows (reference's high-res config).
run w32_384 2400 env BENCH_INPUT=288,384 python bench.py
run w48_384 3600 env BENCH_INPUT=288,384 BENCH_MODEL=hrnet_w48 python bench.py

# 4. XLA-flags A/B on the headline config.
run xla_flags 7200 python -m infantposeestimation_gaussianbias_tpu.tools.probe_xla_flags

# 5. Native host-loader probe (CPU-only; just needs a quiet box).
run native_loader 1200 python -m infantposeestimation_gaussianbias_tpu.tools.probe_native_loader

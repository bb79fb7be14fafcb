"""A/B serving throughput under candidate XLA_FLAGS combinations.

XLA flags bind at backend initialization, so each combination runs
bench.py in a fresh subprocess (one at a time — TPU executions from
parallel processes serialize and would corrupt the timing).  The
combinations probe the usual TPU levers for an inference-only program:
the latency-hiding scheduler (overlaps HBM DMA with MXU compute) and
aggressive fusion autotuning.

Usage: python -m infantposeestimation_gaussianbias_tpu.tools.probe_xla_flags
Env: PROBE_BENCH_ENV extra "K=V,K=V" forwarded to bench.py (e.g.
     "BENCH_QUANT=1,BENCH_BATCH=256").
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

COMBOS = {
    "default": "",
    "latency_hiding": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "no_rematerialization": "--xla_tpu_enable_latency_hiding_scheduler=true "
                            "--xla_tpu_rwb_fusion=false",
    "async_collectives": "--xla_tpu_enable_latency_hiding_scheduler=true "
                         "--xla_tpu_enable_async_collective_fusion=true",
}


def main():
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    bench = os.path.join(root, "bench.py")
    extra = {}
    for kv in filter(None, os.environ.get("PROBE_BENCH_ENV", "").split(",")):
        k, _, v = kv.partition("=")
        extra[k] = v

    results = {}
    for name, flags in COMBOS.items():
        env = dict(os.environ, **extra)
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        # Flag combos change the compiled program; keep the persistent
        # cache from mixing entries across combos.
        env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "86400"
        print(f"== {name}: XLA_FLAGS={env.get('XLA_FLAGS', '')!r}",
              flush=True)
        # The tunnel releases the previous bench's client session lazily
        # (tens of seconds after process exit); a fresh bench that attaches
        # during that window reports "device unreachable". Retry the combo
        # with a settle delay instead of dropping it.
        r = None
        for attempt in range(4):
            if attempt:
                print(f"   settle retry {attempt} in 90s...", flush=True)
                time.sleep(90)
            proc = subprocess.run([sys.executable, bench], env=env,
                                  capture_output=True, text=True,
                                  timeout=3600)
            line = next((ln for ln in proc.stdout.splitlines()
                         if ln.startswith("{")), None)
            if proc.returncode != 0 or line is None:
                print(f"   FAILED rc={proc.returncode}: "
                      f"{proc.stderr.strip()[-400:]}", flush=True)
                continue
            got = json.loads(line)
            if "error" in got:
                print(f"   bench error: {got['error']}", flush=True)
                continue
            r = got
            break
        if r is None:
            continue
        results[name] = r["value"]
        print(f"   {r['value']:,.1f} crops/s "
              f"({r.get('ms_per_batch', '?')} ms/batch)", flush=True)

    if "default" in results:
        base = results["default"]
        for name, v in results.items():
            print(f"{name:24s} {v:10,.1f} crops/s  {v / base:5.3f}x",
                  flush=True)


if __name__ == "__main__":
    main()

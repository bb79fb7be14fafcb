"""A/B serving throughput under candidate TPU compiler options.

TPU compiler flags cannot be passed through XLA_FLAGS in this
environment: that env var is parsed by the CLIENT-side XLA (a CPU build
plus the tunnel plugin), which hard-aborts on unknown ``xla_tpu_*``
names — the TPU compiler lives on the server side of the tunnel.  The
portable, per-program route is PJRT CompileOptions
(``jit(...).lower(...).compile(compiler_options=...)``), which bench.py
applies when ``BENCH_COMPILER_OPTIONS`` is set (a JSON dict of flag
name -> value).  Each combination still runs in a fresh subprocess so
combos cannot contaminate each other's process state.

The combinations probe the usual TPU levers for an inference-only
program: the latency-hiding scheduler (overlaps HBM DMA with MXU
compute), read-write-bundle fusion, and the scoped-VMEM fusion budget.

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
    "default": {},
    "latency_hiding": {
        "xla_tpu_enable_latency_hiding_scheduler": "true"},
    "no_rwb_fusion": {
        "xla_tpu_enable_latency_hiding_scheduler": "true",
        "xla_tpu_rwb_fusion": "false"},
    "scoped_vmem_64m": {
        "xla_tpu_scoped_vmem_limit_kib": "65536"},
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
    for name, opts in COMBOS.items():
        env = dict(os.environ, **extra)
        if opts:
            env["BENCH_COMPILER_OPTIONS"] = json.dumps(opts)
        print(f"== {name}: compiler_options={opts}", flush=True)
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

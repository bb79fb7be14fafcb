"""Inference benchmark harness.

Rebuild of /root/reference/analysis/nn_quantitative_viz.py:600-659
(measure_inference_time: warmup + N timed runs with device sync,
mean/std/median) on block_until_ready, plus a data-pipeline throughput
harness mirroring /root/reference/data/test_transforms.py:382-431.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import numpy as np

import jax


def measure_inference_time(fn: Callable, *args, warmup: int = 10,
                           runs: int = 100) -> Dict[str, float]:
    """Warmup then time `runs` calls of a (jitted) fn; mean/std/median/min
    in ms (the reference's protocol, cuda.synchronize -> block_until_ready)."""
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append((time.perf_counter() - t0) * 1e3)
    t = np.asarray(times)
    return {
        "mean_ms": float(t.mean()),
        "std_ms": float(t.std()),
        "median_ms": float(np.median(t)),
        "min_ms": float(t.min()),
        "max_ms": float(t.max()),
        "runs": runs,
    }


def benchmark_pipeline(sample_fn: Callable[[int], object],
                       iterations: int = 100) -> Dict[str, float]:
    """Host data-pipeline throughput: ms/sample + samples/sec
    (ref data/test_transforms.py:382-431)."""
    sample_fn(0)  # warm caches
    t0 = time.perf_counter()
    for i in range(iterations):
        sample_fn(i)
    dt = time.perf_counter() - t0
    return {
        "ms_per_sample": dt / iterations * 1e3,
        "samples_per_sec": iterations / dt,
        "iterations": iterations,
    }


def profile_trace(fn: Callable, *args, trace_dir: str = "/tmp/jax_trace",
                  iters: int = 3):
    """Capture an XProf trace of `fn` (jax.profiler equivalent of the
    reference's manual timing hooks, SURVEY.md section 5.1).  View with
    TensorBoard or xprof on the returned directory."""
    fn(*args)  # warm/compile outside the trace
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
    return trace_dir


def benchmark_model(cfg, batch_size: int = 64, warmup: int = 10,
                    runs: int = 100) -> Dict[str, float]:
    """Build the config's model and benchmark its jitted forward."""
    import jax.numpy as jnp

    from ..models import build_model

    model = build_model(cfg)
    W, H = cfg.data.input_size
    x = jnp.zeros((batch_size, H, W, 3), jnp.float32)
    init = jax.jit(lambda r, v: model.init(r, v, False))
    variables = init(jax.random.PRNGKey(0), x[:1])
    fwd = jax.jit(lambda v: model.apply(variables, v, False))
    stats = measure_inference_time(fwd, x, warmup=warmup, runs=runs)
    stats["images_per_sec"] = batch_size / (stats["median_ms"] / 1e3)
    stats["batch_size"] = batch_size
    return stats

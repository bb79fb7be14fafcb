"""Conv/layout/dtype microbenchmark probe (round-2 perf work).

Measures the HRNet-W32 hot conv shapes under the chained-fori protocol
(see bench.py docstring: per-call host timing is unusable in this
environment; K iterations run inside one jit with a data dependency and
per-iter time is (T_K - T_1)/(K-1)).

Questions this answers:
  1. Does int8 conv actually run ~2x bf16 on the v5e (394 TOPS int8 vs
     197 TFLOP/s bf16)?
  2. How efficient are the C=32 branch convs vs the C=128/256 ones
     (MXU lane utilization story from round 1)?
  3. Does space-to-depth packing (C=32 @ HxW -> C=128 @ H/2xW/2) help?

Usage: python -m infantposeestimation_gaussianbias_tpu.tools.probe_conv
Env: PROBE_BATCH (default 256), PROBE_CHAIN (default 32).
"""

from __future__ import annotations

import functools
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

_cache = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                ("NHWC", "HWIO", "NHWC"))


def chained_time(step, x0, k: int = 512, repeats: int = 5) -> float:
    """Per-iteration seconds of `step` (x -> x-like) via the chained protocol.

    Uses two long chains (K0 and K0+k) so the difference is far above the
    ~25 ms dispatch noise even for sub-millisecond ops; per-iter =
    (T_{K0+k} - T_{K0}) / k.
    """
    K0 = 64

    def run(k):
        @jax.jit
        def f(x):
            y = lax.fori_loop(0, k, lambda i, v: step(v), x)
            return jnp.sum(jnp.asarray(y, jnp.float32))
        return f

    def timed(fn):
        float(fn(x0))  # compile + settle
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(fn(x0))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1 = timed(run(K0))
    tk = timed(run(K0 + k))
    return (tk - t1) / k


def conv_step(w, stride=1, out_dtype=None):
    def step(x):
        y = lax.conv_general_dilated(
            x, w, (stride, stride), "SAME", dimension_numbers=DN,
            preferred_element_type=out_dtype)
        if y.dtype != x.dtype:
            if x.dtype == jnp.int8:
                y = jnp.clip(y >> 7, -128, 127).astype(jnp.int8)
            else:
                y = y.astype(x.dtype)
        if y.shape != x.shape:  # stride>1 or channel change: re-expand
            return None  # caller must handle; only used for same-shape chains
        return y
    return step


def bench_same_shape_conv(name, B, H, W, C, dtype, k=32):
    rng = np.random.RandomState(0)
    if dtype == "int8":
        x = jnp.asarray(rng.randint(-127, 127, (B, H, W, C)), jnp.int8)
        w = jnp.asarray(rng.randint(-127, 127, (3, 3, C, C)), jnp.int8)
        step = conv_step(w, out_dtype=jnp.int32)
    else:
        dt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
        x = jnp.asarray(rng.randn(B, H, W, C), dt)
        w = jnp.asarray(rng.randn(3, 3, C, C) * 0.05, dt)
        step = conv_step(w)
    sec = chained_time(step, x)
    flops = 2 * B * H * W * C * C * 9
    print(f"{name:44s} {dtype:5s} {sec * 1e3:8.3f} ms  "
          f"{flops / sec / 1e12:7.1f} T{'OP' if dtype == 'int8' else 'FLOP'}/s",
          flush=True)
    return sec


def bench_s2d_packed(B, H, W, C, dtype, k=32):
    """3x3 conv on (H,W,C) expressed as 3x3 conv on s2d (H/2,W/2,4C) with a
    4x-sparse (4C,4C) kernel: same math, 4x FLOPs, full MXU lanes."""
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    x = jnp.asarray(rng.randn(B, H // 2, W // 2, 4 * C), dt)
    w = jnp.asarray(rng.randn(3, 3, 4 * C, 4 * C) * 0.05, dt)
    sec = chained_time(conv_step(w), x)
    flops_equiv = 2 * B * H * W * C * C * 9  # the useful math
    print(f"{'s2d-packed 3x3 (4x sparse kernel)':44s} {dtype:5s} "
          f"{sec * 1e3:8.3f} ms  {flops_equiv / sec / 1e12:7.1f} TFLOP/s-useful",
          flush=True)
    return sec


def main():
    B = int(os.environ.get("PROBE_BATCH", "256"))
    print(f"device={jax.devices()[0]}  batch={B}", flush=True)

    # HRNet-W32 branch conv shapes (stride-1 3x3, C_in=C_out):
    shapes = [
        ("branch0 64x48xC32", 64, 48, 32),
        ("branch1 32x24xC64", 32, 24, 64),
        ("branch2 16x12xC128", 16, 12, 128),
        ("branch3 8x6xC256", 8, 6, 256),
    ]
    for name, H, W, C in shapes:
        for dtype in ("bf16", "int8"):
            bench_same_shape_conv(f"{name}", B, H, W, C, dtype)

    # The lane-util hypothesis: same spatial size, wider channels.
    bench_same_shape_conv("branch0-spatial @C64 ", B, 64, 48, 64, "bf16")
    bench_same_shape_conv("branch0-spatial @C128", B, 64, 48, 128, "bf16")
    # s2d packing of branch0
    bench_s2d_packed(B, 64, 48, 32, "bf16")
    bench_s2d_packed(B, 64, 48, 32, "int8") if False else None

    # big-matmul calibration for int8 peak
    for dtype in ("bf16", "int8"):
        rng = np.random.RandomState(0)
        n = 4096
        if dtype == "int8":
            a = jnp.asarray(rng.randint(-127, 127, (n, n)), jnp.int8)
            w = jnp.asarray(rng.randint(-127, 127, (n, n)), jnp.int8)

            def step(x):
                y = lax.dot(x, w, preferred_element_type=jnp.int32)
                return jnp.clip(y >> 12, -128, 127).astype(jnp.int8)
        else:
            a = jnp.asarray(rng.randn(n, n), jnp.bfloat16)
            w = jnp.asarray(rng.randn(n, n) * 0.01, jnp.bfloat16)

            def step(x):
                return lax.dot(x, w).astype(jnp.bfloat16)
        sec = chained_time(step, a, 256)
        flops = 2 * n * n * n
        print(f"{'matmul 4096^3 calibration':44s} {dtype:5s} "
              f"{sec * 1e3:8.3f} ms  {flops / sec / 1e12:7.1f} "
              f"T{'OP' if dtype == 'int8' else 'FLOP'}/s", flush=True)


if __name__ == "__main__":
    main()

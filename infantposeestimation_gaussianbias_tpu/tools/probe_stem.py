"""Stem optimization probe (round-2 perf work).

tools/probe_model.py showed the HRNet stem is 18 ms of the 56 ms
backbone at batch 256 — wildly off its ~0.35 ms of MXU FLOPs.  The
suspect is the C_in=3 first conv at 256x192 (3 input channels use 2% of
the 128 MXU lanes, and XLA's TPU conv for tiny C_in can fall off the
fast path entirely).  This probe times:

  1. stem1 as written: 3x3 s2 conv 3->64 @ 256x192
  2. stem2 as written: 3x3 s2 conv 64->64 @ 128x96
  3. stem1 via space-to-depth: input packed to 128x96x12, the 3x3 s2
     kernel embedded in a 2x2 s1 kernel over 12 channels (same math)
  4. stem1 via im2col: strided patch extraction + (27 -> 64) matmul
  5. both stems with bf16 vs int8

Usage: python -m infantposeestimation_gaussianbias_tpu.tools.probe_stem
Env: PROBE_BATCH (default 256).
"""

from __future__ import annotations

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


def chained_time(fn, x0, k: int = 128, K0: int = 16, repeats: int = 5):
    """Per-iteration seconds; fn maps x -> y (any shape).  A scalar
    feedback term re-perturbs x each iteration so XLA cannot hoist."""

    def run(n):
        @jax.jit
        def f(x):
            def body(i, carry):
                xx, acc = carry
                y = fn(xx)
                s = jnp.sum(jnp.asarray(y, jnp.float32))
                return x + (1e-20 * s).astype(x.dtype), acc + s
            _, acc = lax.fori_loop(0, n, body, (x, jnp.float32(0)))
            return acc
        return f

    def timed(g):
        float(g(x0))
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(g(x0))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1 = timed(run(K0))
    tk = timed(run(K0 + k))
    return (tk - t1) / k


def report(name, sec):
    print(f"{name:46s} {sec * 1e3:8.3f} ms", flush=True)


def s2d_pack(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), sub-pixel-major channel order:
    out[..., (di*2+dj)*C + c] = x[..., 2i+di, 2j+dj, c]."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // 2, W // 2, 4 * C)


def embed_stem_kernel_s2d(w):
    """(3, 3, C, O) s2 kernel -> (2, 2, 4C, O) s1 kernel on s2d input.

    o[i,j] = sum_{u,v} w[u,v] x[2i-1+u, 2j-1+v]; with s2d cells at
    (i-1+a, j-1+b), row 2i-1+u lives in cell a=(u+1)//2 with sub-row
    q=(u+1)%2.  Explicit padding ((1,0),(1,0)).
    """
    C, O = w.shape[2], w.shape[3]
    w2 = np.zeros((2, 2, 4 * C, O), w.dtype)
    for u in range(3):
        a, q = (u + 1) // 2, (u + 1) % 2
        for v in range(3):
            b, r = (v + 1) // 2, (v + 1) % 2
            w2[a, b, (q * 2 + r) * C:(q * 2 + r) * C + C, :] = w[u, v]
    return w2


def main():
    B = int(os.environ.get("PROBE_BATCH", "256"))
    print(f"device={jax.devices()[0]}  batch={B}", flush=True)
    rng = np.random.RandomState(0)
    DT = jnp.bfloat16

    x_img = jnp.asarray(rng.randn(B, 256, 192, 3), DT)
    w1 = rng.randn(3, 3, 3, 64).astype(np.float32) * 0.1
    w1j = jnp.asarray(w1, DT)
    x_mid = jnp.asarray(rng.randn(B, 128, 96, 64), DT)
    w2j = jnp.asarray(rng.randn(3, 3, 64, 64) * 0.05, DT)

    def conv(x, w, s, pad):
        dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(x, w, (s, s), pad,
                                        dimension_numbers=dn)

    # 1) stem1 as written
    report("stem1 3x3s2 3->64 @256x192 bf16",
           chained_time(lambda x: conv(x, w1j, 2, ((1, 1), (1, 1))), x_img))

    # 2) stem2 as written
    report("stem2 3x3s2 64->64 @128x96 bf16",
           chained_time(lambda x: conv(x, w2j, 2, ((1, 1), (1, 1))), x_mid))

    # 3) stem1 via s2d + embedded 2x2 kernel
    w1_s2d = jnp.asarray(embed_stem_kernel_s2d(w1), DT)

    def stem1_s2d(x):
        xp = s2d_pack(x)
        return conv(xp, w1_s2d, 1, ((1, 0), (1, 0)))

    # parity check first
    ref = np.asarray(conv(x_img[:2].astype(jnp.float32),
                          w1j.astype(jnp.float32), 2, ((1, 1), (1, 1))))
    got = np.asarray(stem1_s2d(x_img[:2]).astype(jnp.float32))
    err = np.abs(ref - got).max() / np.abs(ref).max()
    print(f"s2d parity rel err: {err:.4f}", flush=True)
    report("stem1 via s2d 2x2 12->64 @128x96 bf16",
           chained_time(stem1_s2d, x_img))

    # 3b) s2d packing alone (how much is the relayout?)
    report("s2d pack alone", chained_time(s2d_pack, x_img))

    # 4) stem1 via im2col patches + matmul
    def stem1_im2col(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        pats = lax.conv_general_dilated_patches(
            xp, (3, 3), (2, 2), "VALID",
            dimension_numbers=lax.conv_dimension_numbers(
                xp.shape, (3, 3, 3, 64), ("NHWC", "HWIO", "NHWC")))
        wi = w1j.reshape(27, 64)
        return jnp.einsum("bhwp,po->bhwo", pats, wi)

    report("stem1 via im2col patches+matmul bf16",
           chained_time(stem1_im2col, x_img))

    # 5) int8 variants of both stems
    x_img8 = jnp.asarray(rng.randint(-127, 127, (B, 256, 192, 3)), jnp.int8)
    w18 = jnp.asarray(rng.randint(-127, 127, (3, 3, 3, 64)), jnp.int8)
    x_mid8 = jnp.asarray(rng.randint(-127, 127, (B, 128, 96, 64)), jnp.int8)
    w28 = jnp.asarray(rng.randint(-127, 127, (3, 3, 64, 64)), jnp.int8)

    def conv8(x, w, s, pad):
        dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_general_dilated(x, w, (s, s), pad,
                                     dimension_numbers=dn,
                                     preferred_element_type=jnp.int32)
        return jnp.clip(y >> 7, -127, 127).astype(jnp.int8)

    report("stem1 int8", chained_time(
        lambda x: conv8(x, w18, 2, ((1, 1), (1, 1))), x_img8))
    report("stem2 int8", chained_time(
        lambda x: conv8(x, w28, 2, ((1, 1), (1, 1))), x_mid8))

    # s2d int8 stem1
    w1_s2d8 = jnp.asarray(
        np.clip(np.round(embed_stem_kernel_s2d(w1) * 127), -127, 127),
        jnp.int8)
    report("stem1 via s2d int8", chained_time(
        lambda x: conv8(s2d_pack(x), w1_s2d8, 1, ((1, 0), (1, 0))), x_img8))

    # 6) fused whole-stem comparisons (bf16): as-written vs s2d first conv
    def stem_pair(x):
        y = jnp.maximum(conv(x, w1j, 2, ((1, 1), (1, 1))), 0)
        return jnp.maximum(conv(y, w2j, 2, ((1, 1), (1, 1))), 0)

    def stem_pair_s2d(x):
        y = jnp.maximum(stem1_s2d(x), 0)
        return jnp.maximum(conv(y, w2j, 2, ((1, 1), (1, 1))), 0)

    report("whole stem as written bf16", chained_time(stem_pair, x_img))
    report("whole stem s2d-first bf16", chained_time(stem_pair_s2d, x_img))


if __name__ == "__main__":
    main()

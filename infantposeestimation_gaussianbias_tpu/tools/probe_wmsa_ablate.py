"""In-kernel ablation of the fused W-MSA qkv kernel (round-5).

The packed block-diagonal variant measured NO faster than the per-window
kernel at branch-0 shapes (1.30 vs 1.27 ms), so the bottleneck must be
pinned empirically before more kernel surgery.  Four variants stream the
same (nW, N, 3C) qkv blocks through the same grid and differ only in the
body:

  empty    — out = q slice (pure HBM streaming + grid overhead)
  gemmonly — QK^T and PV matmuls, softmax replaced by a scalar scale
  softonly — softmax on a broadcast score tile, no matmuls
  full     — the shipped kernel body (scale -> QK -> +bias -> softmax -> PV)
  packfull — the packed block-diagonal body (pack copies + big GEMMs)
  packslim — dense-stacked packing: scores for G windows via ONE
             (G*N, hd)@(hd, G*N) GEMM from pure reshapes (no zero-padding
             copies), masked softmax, then (G*N, G*N)@(G*N, hd) PV

Env: PROBE_SHAPE "nW,N,C,H" (default branch-0: 8960,49,32,1),
     PROBE_GB (default 32).
"""

from __future__ import annotations

import functools
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_cache = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ..ops.pallas.window_msa import (  # noqa: E402
    _attn_qkv_kernel,
    _attn_qkv_kernel_packed,
    _pack_factor,
    _packed_bias,
)


def chained_time(fn, args, k: int = 64, K0: int = 8, repeats: int = 5):
    def run(n):
        @jax.jit
        def f(x, *rest):
            def body(i, carry):
                xx, acc = carry
                y = fn(xx, *rest)
                s = jnp.sum(y.astype(jnp.float32))
                return x + (1e-20 * s).astype(x.dtype), acc + s
            _, acc = lax.fori_loop(0, n, body, (x, jnp.float32(0)))
            return acc
        return f

    def timed(g):
        float(g(*args))
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(g(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1 = timed(run(K0))
    tk = timed(run(K0 + k))
    return (tk - t1) / k


def _kernel_empty(qkv_ref, bias_ref, out_ref, *, num_heads, scale):
    C = out_ref.shape[-1]
    out_ref[...] = qkv_ref[:, :, :C]


def _kernel_gemmonly(qkv_ref, bias_ref, out_ref, *, num_heads, scale):
    C = out_ref.shape[-1]
    hd = C // num_heads
    for h in range(num_heads):
        q = qkv_ref[:, :, h * hd:(h + 1) * hd].astype(jnp.float32) * scale
        k = qkv_ref[:, :, C + h * hd:C + (h + 1) * hd].astype(jnp.float32)
        v = qkv_ref[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd].astype(
            jnp.float32)
        s = lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
        p = s * jnp.float32(0.01)  # softmax elided
        o = lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
        out_ref[:, :, h * hd:(h + 1) * hd] = o.astype(out_ref.dtype)


def _kernel_softonly(qkv_ref, bias_ref, out_ref, *, num_heads, scale):
    C = out_ref.shape[-1]
    hd = C // num_heads
    N = qkv_ref.shape[1]
    for h in range(num_heads):
        q = qkv_ref[:, :, h * hd:(h + 1) * hd].astype(jnp.float32)
        # fake (GB, N, N) scores without a matmul: broadcast one lane
        s = jnp.broadcast_to(q[:, :, :1], q.shape[:2] + (N,))
        s = s + bias_ref[0].astype(jnp.float32)[None]
        p = jax.nn.softmax(s, axis=-1)
        # reduce back to (GB, N, hd) without a matmul
        o = q * jnp.sum(p, axis=-1, keepdims=True)
        out_ref[:, :, h * hd:(h + 1) * hd] = o.astype(out_ref.dtype)


def _kernel_packslim(qkv_ref, pbias_ref, out_ref, *, num_heads, scale,
                     pack):
    # Dense-stacked packing: G windows' tokens stacked along rows by a
    # PURE RESHAPE (no zero-block copies).  QK is (G*N, hd)@(hd, G*N)
    # computing all cross-window scores; the packed masked bias kills
    # the off-diagonal blocks in the softmax; PV is (G*N, G*N)@(G*N, hd)
    # with the zeroed cross blocks contributing nothing.
    C = out_ref.shape[-1]
    hd = C // num_heads
    G = pack
    GB, N, _ = qkv_ref.shape
    ngrp = GB // G
    for h in range(num_heads):
        q = qkv_ref[:, :, h * hd:(h + 1) * hd].astype(jnp.float32) * scale
        k = qkv_ref[:, :, C + h * hd:C + (h + 1) * hd].astype(jnp.float32)
        v = qkv_ref[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd].astype(
            jnp.float32)
        qs = q.reshape(ngrp, G * N, hd)
        ks = k.reshape(ngrp, G * N, hd)
        vs = v.reshape(ngrp, G * N, hd)
        s4 = lax.dot_general(qs, ks, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
        s4 = s4 + pbias_ref[h].astype(jnp.float32)[None]
        p4 = jax.nn.softmax(s4, axis=-1)
        o4 = lax.dot_general(p4, vs, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
        o = o4.reshape(GB, N, hd)
        out_ref[:, :, h * hd:(h + 1) * hd] = o.astype(out_ref.dtype)


def run_variant(name, kernel, qkv, bias, H, GB, packed=False, G=1):
    nW, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // H
    if packed:
        bias_in = _packed_bias(bias, G)
        bias_spec = pl.BlockSpec((H, G * N, G * N), lambda w: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
        body = functools.partial(kernel, num_heads=H, scale=hd**-0.5,
                                 pack=G)
    else:
        bias_in = bias
        bias_spec = pl.BlockSpec((H, N, N), lambda w: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
        body = functools.partial(kernel, num_heads=H, scale=hd**-0.5)

    def call(x):
        return pl.pallas_call(
            body,
            grid=(nW // GB,),
            in_specs=[
                pl.BlockSpec((GB, N, C3), lambda w: (w, 0, 0),
                             memory_space=pltpu.VMEM),
                bias_spec,
            ],
            out_specs=pl.BlockSpec((GB, N, C), lambda w: (w, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nW, N, C), x.dtype),
        )(x, bias_in)

    sec = chained_time(call, (qkv,))
    print(f"{name:10s} GB={GB:3d} {sec * 1e3:8.3f} ms", flush=True)
    return sec


def main():
    nW, N, C, H = (int(v) for v in os.environ.get(
        "PROBE_SHAPE", "8960,49,32,1").split(","))
    GB = int(os.environ.get("PROBE_GB", "32"))
    print(f"device={jax.devices()[0]} shape nW={nW} N={N} C={C} H={H}",
          flush=True)
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(nW, N, 3 * C), jnp.bfloat16)
    bias = jnp.asarray(rng.randn(H, N, N), jnp.float32)
    G = _pack_factor(H, C, N)

    for gb in (GB, 64, 128, 256, 512):
        if nW % gb == 0:
            run_variant("empty", _kernel_empty, qkv, bias, H, gb)
            run_variant("full", _attn_qkv_kernel, qkv, bias, H, gb)
    run_variant("gemmonly", _kernel_gemmonly, qkv, bias, H, GB)
    run_variant("softonly", _kernel_softonly, qkv, bias, H, GB)


if __name__ == "__main__":
    main()

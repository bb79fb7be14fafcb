"""Model-component decomposition probe (round-2 perf work).

probe_conv.py showed the individual branch convs already run at 60-100%
MXU efficiency in bf16, so the backbone's gap to speed-of-light
(~47.5 ms measured vs ~10 ms of pure conv FLOPs at batch 256) lives
BETWEEN the convs.  This probe times each structural component of
HRNet-W32 with the chained two-point protocol to localize it:

  full backbone = stem + stage1 + 1 x module2 + 4 x module3 +
                  3 x module4 + transitions

Usage: python -m infantposeestimation_gaussianbias_tpu.tools.probe_model
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


def chained_time(step, x0, k: int = 256, K0: int = 16,
                 repeats: int = 5) -> float:
    """Per-iteration seconds via two long chains (see probe_conv.py)."""

    def run(n):
        @jax.jit
        def f(x):
            y = lax.fori_loop(0, n, lambda i, v: step(v), x)
            return sum(jnp.sum(jnp.asarray(t, jnp.float32))
                       for t in jax.tree_util.tree_leaves(y))
        return f

    def timed(fn):
        float(fn(x0))
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(fn(x0))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1 = timed(run(K0))
    tk = timed(run(K0 + k))
    return (tk - t1) / k


def scalar_chain(fn, x0):
    """Wrap y=fn(x) (shape-changing) into a same-shape step via a scalar
    feedback term (adds one broadcast add over x per iteration)."""

    def step(x):
        y = fn(x)
        s = sum(jnp.mean(jnp.asarray(t, jnp.float32))
                for t in jax.tree_util.tree_leaves(y))
        return jax.tree_util.tree_map(
            lambda t: t + (1e-12 * s).astype(t.dtype), x0)
    return step


def report(name, sec, batch):
    print(f"{name:40s} {sec * 1e3:8.3f} ms  "
          f"({batch / sec:8.0f} crops/s)", flush=True)


def main():
    from ..models import hrnet
    from ..models.layers import BasicBlock, ConvNorm, resize_bilinear

    B = int(os.environ.get("PROBE_BATCH", "256"))
    DT = jnp.bfloat16
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    print(f"device={jax.devices()[0]}  batch={B}  dtype=bf16", flush=True)

    def rand(shape):
        return jnp.asarray(rng.randn(*shape), DT)

    def bench_module(name, module, xs, same_shape):
        init = jax.jit(lambda r, v: module.init(r, v, False))
        variables = init(key, xs)
        fn = lambda v: module.apply(variables, v, False)
        step = fn if same_shape else scalar_chain(fn, xs)
        sec = chained_time(step, xs)
        report(name, sec, B)
        return sec

    C = 32
    shapes = [(64, 48, C), (32, 24, 2 * C), (16, 12, 4 * C), (8, 6, 8 * C)]

    # Full backbone.
    model = hrnet.hrnet_w32(dtype=DT)
    x_in = rand((B, 256, 192, 3))
    bench_module("backbone hrnet_w32", model, x_in, same_shape=False)

    # Stem (2 stride-2 ConvNorms 3->64->64).
    class Stem(hrnet.nn.Module):
        @hrnet.nn.compact
        def __call__(self, x, train=False):
            x = ConvNorm(64, 3, strides=2, dtype=DT, name="stem1")(x, train)
            return ConvNorm(64, 3, strides=2, dtype=DT, name="stem2")(x, train)

    bench_module("stem", Stem(), x_in, same_shape=False)

    # Stage1 (4 Bottlenecks 64->256 @ 64x48).
    class Stage1(hrnet.nn.Module):
        @hrnet.nn.compact
        def __call__(self, x, train=False):
            from ..models.layers import Bottleneck
            for b in range(4):
                x = Bottleneck(64, dtype=DT, name=f"b{b}")(x, train)
            return x

    bench_module("stage1 (4 bottlenecks)", Stage1(),
                 rand((B, 64, 48, 64)), same_shape=False)

    # Exchange modules per stage (branch blocks + fuse).
    for n, label in ((2, "module2"), (3, "module3"), (4, "module4")):
        chans = [c for _, _, c in shapes[:n]]
        xs = [rand((B, h, w, c)) for h, w, c in shapes[:n]]
        mod = hrnet.HRModule(tuple(chans), dtype=DT)
        bench_module(f"{label} ({n} branches, full)", mod, xs,
                     same_shape=True)

    # One BasicBlock at branch-0 shape (2 convs + residual + BN/ReLU):
    bench_module("BasicBlock @64x48xC32", BasicBlock(C, dtype=DT),
                 rand((B, 64, 48, C)), same_shape=True)

    # The most expensive fuse resize (16x12 -> 64x48 @ C128).
    x = rand((B, 16, 12, 4 * C))
    sec = chained_time(
        scalar_chain(lambda v: resize_bilinear(v, 64, 48), x), x)
    report("resize 16x12->64x48 @C128", sec, B)

    # Bare conv vs ConvNorm at branch-0 shape: BN epilogue cost.
    x = rand((B, 64, 48, C))
    w = jnp.asarray(rng.randn(3, 3, C, C) * 0.05, DT)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    sec = chained_time(
        lambda v: lax.conv_general_dilated(v, w, (1, 1), "SAME",
                                           dimension_numbers=dn), x)
    report("bare conv @64x48xC32", sec, B)
    bench_module("ConvNorm @64x48xC32", ConvNorm(C, 3, dtype=DT),
                 rand((B, 64, 48, C)), same_shape=True)


if __name__ == "__main__":
    main()

"""Section-level backward-cost probe (round-2 perf work, VERDICT #8).

probe_train.py showed the HRNet-W32+fusion model backward costs ~3x its
forward (ideal: ~2x of fwd FLOPs).  This probe times fwd vs fwd+bwd for
each architectural section in isolation (batch 128, bf16, chained
two-point protocol) to find where the extra backward time lives:

  stem        2x stride-2 ConvNorm      @ 256x192x3
  stage1      4 Bottlenecks             @ 64x48x64
  stage3 mod  HRModule (3 branches)     @ 64x48x32 / 32x24x64 / 16x12x128
  fusion head trunk + 3 branches        @ 64x48x32

Usage: python -m infantposeestimation_gaussianbias_tpu.tools.probe_bwd
Env: PROBE_BATCH (default 128).
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

_cache = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def chained_time(fn, x0, k: int = 48, K0: int = 8, repeats: int = 5):
    def run(n):
        @jax.jit
        def f(x):
            def body(i, carry):
                xx, acc = carry
                y = fn(xx)
                s = sum(jnp.sum(jnp.asarray(t, jnp.float32))
                        for t in jax.tree_util.tree_leaves(y))
                return jax.tree_util.tree_map(
                    lambda t: t + (1e-20 * s).astype(t.dtype), x), acc + s
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


def probe(name, module, x, train=True):
    variables = jax.jit(lambda r, v: module.init(r, v, False))(
        jax.random.PRNGKey(0), jax.tree_util.tree_map(lambda t: t[:1], x))
    params = variables["params"]
    stats = variables.get("batch_stats")

    def fwd(v):
        var = {"params": params}
        if stats is not None:
            var["batch_stats"] = stats
            out, _ = module.apply(var, v, train, mutable=["batch_stats"])
        else:
            out = module.apply(var, v, train)
        return out

    def fwd_bwd(v):
        def compute(p):
            var = {"params": p}
            if stats is not None:
                var["batch_stats"] = stats
                out, _ = module.apply(var, v, train,
                                      mutable=["batch_stats"])
            else:
                out = module.apply(var, v, train)
            return sum(jnp.sum(jnp.square(jnp.asarray(t, jnp.float32)))
                       for t in jax.tree_util.tree_leaves(out))
        return jax.grad(compute)(params)

    tf = chained_time(fwd, x)
    tb = chained_time(fwd_bwd, x)
    print(f"{name:34s} fwd {tf * 1e3:7.2f} ms   fwd+bwd {tb * 1e3:7.2f} ms"
          f"   bwd/fwd {(tb - tf) / tf:5.2f}x", flush=True)
    return tf, tb


class Stem(nn.Module):
    norm: str = "batchnorm"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        from ..models.layers import ConvNorm
        kw = dict(norm=self.norm, dtype=self.dtype)
        x = ConvNorm(64, 3, strides=2, name="stem1", **kw)(x, train)
        return ConvNorm(64, 3, strides=2, name="stem2", **kw)(x, train)


class Stage1(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        from ..models.layers import Bottleneck
        for b in range(4):
            x = Bottleneck(64, name=f"b{b}", dtype=self.dtype)(x, train)
        return x


class Branches(nn.Module):
    """The branch-block half of a stage-3 HRModule (no fuse)."""
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, xs, train=False):
        from ..models.layers import BasicBlock
        chs = (32, 64, 128)
        ys = []
        for i, x in enumerate(xs):
            for b in range(4):
                x = BasicBlock(chs[i], name=f"br{i}_b{b}",
                               dtype=self.dtype)(x, train)
            ys.append(x)
        return ys


def main():
    from ..models.hrnet import HRModule
    from ..models.heads import FusionHead

    B = int(os.environ.get("PROBE_BATCH", "128"))
    dt = jnp.bfloat16
    print(f"device={jax.devices()[0]}  batch={B}  bf16  (train-mode fwd)",
          flush=True)
    rng = np.random.RandomState(0)

    def arr(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(dt)

    probe("stem @256x192x3", Stem(dtype=dt), arr(B, 256, 192, 3))
    probe("stage1 4xBottleneck @64x48x64", Stage1(dtype=dt),
          arr(B, 64, 48, 64))
    xs3 = [arr(B, 64, 48, 32), arr(B, 32, 24, 64), arr(B, 16, 12, 128)]
    probe("stage3 HRModule (blocks+fuse)", HRModule((32, 64, 128), dtype=dt),
          xs3)
    probe("stage3 branches only (no fuse)", Branches(dtype=dt), xs3)
    probe("fusion head @64x48x32",
          FusionHead(num_keypoints=17, hidden_dim=256, dtype=dt),
          arr(B, 64, 48, 32))


if __name__ == "__main__":
    main()

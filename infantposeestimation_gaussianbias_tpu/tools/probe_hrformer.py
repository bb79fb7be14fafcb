"""HRFormer Pallas-vs-XLA model-level re-benchmark (round-2, VERDICT #2).

Round 1 recorded HRFormer-Small @ b128: 128 ms XLA vs 138 ms with the
Pallas W-MSA kernel — the kernel wins in isolation (0.03 vs 0.04 ms)
but the wrapper relayouts cost more than the fusion saves.  Commit
ff1f5eb then made the wrapper produce head-major qkv directly; this
probe records the post-change model-level numbers that round 1 never
measured, for both hrformer_small and hrformer_base.

Usage: python -m infantposeestimation_gaussianbias_tpu.tools.probe_hrformer
Env: PROBE_BATCH (default 128), PROBE_MODELS (default "hrformer_small").
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


def chained_time(fn, x0, k: int = 64, K0: int = 8, repeats: int = 5):
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


def main():
    from ..models import BACKBONES

    B = int(os.environ.get("PROBE_BATCH", "128"))
    names = os.environ.get("PROBE_MODELS", "hrformer_small").split(",")
    print(f"device={jax.devices()[0]}  batch={B}  dtype=bf16", flush=True)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, 256, 192, 3), jnp.bfloat16)

    for name in names:
        results = {}
        for use_pallas in (False, True):
            model = BACKBONES[name](dtype=jnp.bfloat16,
                                    use_pallas=use_pallas)
            variables = jax.jit(
                lambda r, v: model.init(r, v, False))(
                    jax.random.PRNGKey(0), x[:1])
            sec = chained_time(
                lambda v: model.apply(variables, v, False), x)
            label = "pallas" if use_pallas else "xla"
            results[label] = sec
            print(f"{name:16s} {label:7s} {sec * 1e3:8.2f} ms/iter "
                  f"({B / sec:7.0f} crops/s)", flush=True)
        ratio = results["xla"] / results["pallas"]
        print(f"{name:16s} pallas speedup vs xla: {ratio:.3f}x", flush=True)


if __name__ == "__main__":
    main()

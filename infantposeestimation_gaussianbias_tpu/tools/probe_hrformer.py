"""HRFormer Pallas-vs-XLA model-level re-benchmark (round-2, VERDICT #2).

Round 1 recorded HRFormer-Small @ b128: 128 ms XLA vs 138 ms with the
Pallas W-MSA kernel — the kernel wins in isolation (0.03 vs 0.04 ms)
but the wrapper relayouts cost more than the fusion saves.  Commit
ff1f5eb then made the wrapper produce head-major qkv directly; this
probe records the post-change model-level numbers that round 1 never
measured, for both hrformer_small and hrformer_base.

Usage: python -m infantposeestimation_gaussianbias_tpu.tools.probe_hrformer
Env: PROBE_BATCH (default 128), PROBE_MODELS (default "hrformer_small"),
PROBE_TRAIN=1 to time train-mode fwd+bwd instead of inference (exercises
the custom-VJP Pallas backward kernel).
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


def quant_main(B, names, x):
    """Full-model float-vs-int8 serving comparison (PROBE_QUANT=1).

    Dense-PTQ: the transformer qkv/proj/fc1/fc2 run int8 on the MXU
    (~2x bf16 rate on v5e), convs/norms stay bf16, attention stays the
    fused Pallas kernel."""
    from ..config import Config
    from ..models import build_model, quantize_model

    xf = x.astype(jnp.float32)
    for name in names:
        cfg = Config()
        cfg.model.backbone = name
        cfg.model.head_type = "heatmap"
        cfg.model.compute_dtype = "bfloat16"
        cfg.data.input_size = (192, 256)
        cfg.data.heatmap_size = (48, 64)

        model = build_model(cfg)
        variables = jax.jit(lambda r, v: model.init(r, v, False))(
            jax.random.PRNGKey(0), xf[:1])
        qvars = quantize_model(cfg, variables, [xf[:16]])
        qmodel = build_model(cfg, quant=True)

        results = {}
        for label, mdl, v in (("float", model, variables),
                              ("int8", qmodel, qvars)):
            sec = chained_time(
                lambda im, mdl=mdl, v=v: mdl.apply(v, im, False)["heatmaps"],
                xf)
            results[label] = sec
            print(f"{name:16s} {label:6s} [serving] {sec * 1e3:8.2f} ms/iter"
                  f" ({B / sec:7.0f} crops/s)", flush=True)
        # agreement on the same random batch
        a = np.asarray(model.apply(variables, xf[:8], False)["heatmaps"],
                       np.float32).ravel()
        b = np.asarray(qmodel.apply(qvars, xf[:8], False)["heatmaps"],
                       np.float32).ravel()
        cos = float((a * b).sum() /
                    (np.sqrt((a * a).sum() * (b * b).sum()) + 1e-12))
        print(f"{name:16s} int8 speedup {results['float'] / results['int8']:.3f}x"
              f"  cosine(float,int8)={cos:.5f}", flush=True)


def main():
    from ..models import BACKBONES

    B = int(os.environ.get("PROBE_BATCH", "128"))
    names = os.environ.get("PROBE_MODELS", "hrformer_small").split(",")
    print(f"device={jax.devices()[0]}  batch={B}  dtype=bf16", flush=True)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, 256, 192, 3), jnp.bfloat16)

    if os.environ.get("PROBE_QUANT", "0") == "1":
        return quant_main(B, names, x)

    train = os.environ.get("PROBE_TRAIN", "0") == "1"
    mode = "train fwd+bwd" if train else "inference"
    for name in names:
        results = {}
        for use_pallas in (False, True):
            model = BACKBONES[name](dtype=jnp.bfloat16,
                                    use_pallas=use_pallas)
            variables = jax.jit(
                lambda r, v: model.init(r, v, False))(
                    jax.random.PRNGKey(0), x[:1])

            if train:
                params = variables["params"]
                stats = variables.get("batch_stats")

                def fwd_bwd(v, params=params, stats=stats, model=model):
                    def compute(p):
                        var = {"params": p, "batch_stats": stats}
                        out, _ = model.apply(
                            var, v, True, mutable=["batch_stats"],
                            rngs={"dropout": jax.random.PRNGKey(0)})
                        return jnp.sum(jnp.square(
                            out.astype(jnp.float32)))
                    grads = jax.grad(compute)(params)
                    # reduce to a scalar (chained_time sums a single array)
                    return sum(jnp.sum(jnp.asarray(g, jnp.float32))
                               for g in jax.tree_util.tree_leaves(grads))

                sec = chained_time(fwd_bwd, x)
            else:
                sec = chained_time(
                    lambda v: model.apply(variables, v, False), x)
            label = "pallas" if use_pallas else "xla"
            results[label] = sec
            print(f"{name:16s} {label:7s} [{mode}] {sec * 1e3:8.2f} ms/iter "
                  f"({B / sec:7.0f} crops/s)", flush=True)
        ratio = results["xla"] / results["pallas"]
        print(f"{name:16s} pallas speedup vs xla [{mode}]: {ratio:.3f}x",
              flush=True)


if __name__ == "__main__":
    main()

"""Serving-path decomposition probe: where do the e2e milliseconds go?

Times each stage of the production inference pipeline (bench.py's exact
path) in isolation under the chained two-point protocol, for the float
(BN-fold) and int8 PTQ variants:

  warp+normalize -> backbone -> head -> fusion decode -> back-projection

Usage: python -m infantposeestimation_gaussianbias_tpu.tools.probe_serving
Env: PROBE_BATCH (default 256), PROBE_QUANT (default 1), PROBE_MODEL
(default hrnet_w32).
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


def main():
    from ..config import Config
    from ..models import (
        build_model,
        decode_outputs,
        fold_variables,
        quantize_model,
    )
    from ..ops import affine, decode

    B = int(os.environ.get("PROBE_BATCH", "256"))
    quant = os.environ.get("PROBE_QUANT", "1") == "1"
    backbone = os.environ.get("PROBE_MODEL", "hrnet_w32")

    cfg = Config()
    cfg.model.backbone = backbone
    cfg.model.head_type = "fusion"
    cfg.model.compute_dtype = "bfloat16"
    cfg.data.input_size = (192, 256)
    cfg.data.heatmap_size = (48, 64)
    W, H = cfg.data.input_size
    hm_w, hm_h = cfg.data.heatmap_size

    model = build_model(cfg)
    variables = jax.jit(lambda r, x: model.init(r, x, False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 192, 3), jnp.float32))

    rng = np.random.RandomState(0)
    frames = jnp.asarray(
        rng.randint(0, 255, (B, 512, 512, 3)).astype(np.float32))
    centers = jnp.asarray(rng.uniform(128, 384, (B, 2)).astype(np.float32))
    scales = jnp.asarray(
        np.repeat(rng.uniform(150, 400, (B, 1)), 2, 1).astype(np.float32))
    crops = affine.crop_and_normalize(frames, centers, scales, (W, H))

    label = "int8" if quant else "bf16-fold"
    if quant:
        variables = quantize_model(cfg, variables, [crops[:64]])
        model = build_model(cfg, quant=True)
    else:
        variables = fold_variables(variables)
        model = build_model(cfg, fold=True)

    print(f"device={jax.devices()[0]}  batch={B}  {backbone}  {label}",
          flush=True)

    def report(name, sec):
        print(f"{name:32s} {sec * 1e3:8.2f} ms", flush=True)

    report("warp+normalize", chained_time(
        lambda f: affine.crop_and_normalize(f, centers, scales, (W, H)),
        frames))

    outputs = model.apply(variables, crops, False)
    report("model fwd (backbone+head)", chained_time(
        lambda c: model.apply(variables, c, False)["heatmaps"], crops))

    report("fusion decode", chained_time(
        lambda o: decode_outputs(o, "fusion")[0], dict(outputs)))

    coords0, _ = decode_outputs(outputs, "fusion")

    def backproject(c):
        c = c * jnp.asarray([W / hm_w, H / hm_h], jnp.float32)
        return decode.transform_preds(c, centers, scales, (W, H))

    report("back-projection", chained_time(backproject, coords0))

    # Cumulative decomposition (PROBE_CUMULATIVE=1): [backbone],
    # [backbone+head], [backbone+head+decode], each ONE jit — unlike the
    # isolated rows above, these keep the real producer/consumer layout
    # relationships, which is where cross-stage costs (e.g. a relayout
    # between the Pallas W-MSA output and the head convs) show up.
    if os.environ.get("PROBE_CUMULATIVE", "0") == "1":
        def bb_only(c):
            return model.apply(variables, c, False,
                               method=lambda m, x, t: m.backbone(
                                   x.astype(m.dtype), t))

        def bb_head(c):
            return model.apply(variables, c, False)["heatmaps"]

        def bb_head_decode(c):
            return decode_outputs(model.apply(variables, c, False),
                                  "fusion")[0]

        t_bb = chained_time(bb_only, crops)
        t_bh = chained_time(bb_head, crops)
        t_bhd = chained_time(bb_head_decode, crops)
        report("cumulative backbone", t_bb)
        report("cumulative +head", t_bh)
        report("cumulative +decode", t_bhd)
        report("  delta head", t_bh - t_bb)
        report("  delta decode", t_bhd - t_bh)


if __name__ == "__main__":
    main()

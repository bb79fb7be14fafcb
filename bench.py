"""End-to-end benchmark: crops/sec/chip (preprocess -> forward -> decode).

Primary metric from BASELINE.json: HRNet-W32 @ 256x192, the full
single-crop inference pipeline of /root/reference/inference.py:64-215
(affine crop from source frame + normalize + forward + sub-pixel decode +
back-projection to source coordinates), fused into ONE jit and batched.

Baseline: the reference's HRNet-W32 ~22 ms/img on an RTX 3090
(~45 img/s, /root/reference/analysis/hrnet_vs_sota_analysis.md:298).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Timing protocol mirrors the reference harness
(/root/reference/analysis/nn_quantitative_viz.py:600-659): warmup then
timed runs with device sync, median reported.

Env knobs: BENCH_BATCH (default 256), BENCH_ITERS (default 30).
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

# Persistent compilation cache: first compile through the remote TPU
# toolchain is minutes; later runs hit the cache.
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_IMG_PER_S = 45.0  # RTX 3090 HRNet-W32 (~22 ms/img)


def build_pipeline(batch_size: int):
    from infantposeestimation_gaussianbias_tpu.config import Config
    from infantposeestimation_gaussianbias_tpu.models import (
        build_model,
        decode_outputs,
    )
    from infantposeestimation_gaussianbias_tpu.ops import affine, decode

    cfg = Config()
    cfg.model.backbone = "hrnet_w32"
    cfg.model.head_type = "fusion"
    cfg.model.compute_dtype = "bfloat16"
    cfg.data.input_size = (192, 256)
    cfg.data.heatmap_size = (48, 64)

    model = build_model(cfg)
    # jit the init: eager init dispatches hundreds of tiny ops through the
    # device tunnel (~2 min); compiled it is one program.
    init = jax.jit(lambda rng, x: model.init(rng, x, False))
    variables = init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 256, 192, 3), jnp.float32))

    W, H = cfg.data.input_size
    hm_w, hm_h = cfg.data.heatmap_size

    def pipeline(frames, centers, scales):
        # preprocess: batched affine crop + /255 + ImageNet normalize
        crops = affine.crop_and_normalize(frames, centers, scales, (W, H))
        # forward
        outputs = model.apply(variables, crops, False)
        # decode: soft-argmax + local Gaussian fit + offset correction
        coords, scores = decode_outputs(outputs, "fusion")
        # heatmap -> input scale, then back to source-frame coordinates
        coords = coords * jnp.asarray([W / hm_w, H / hm_h], jnp.float32)
        coords = decode.transform_preds(coords, centers, scales, (W, H))
        return coords, scores

    rng = np.random.RandomState(0)
    frames = jnp.asarray(
        rng.randint(0, 255, (batch_size, 512, 512, 3)).astype(np.float32))
    centers = jnp.asarray(rng.uniform(128, 384, (batch_size, 2))
                          .astype(np.float32))
    scales = jnp.asarray(
        np.repeat(rng.uniform(150, 400, (batch_size, 1)), 2, 1)
        .astype(np.float32))
    return jax.jit(pipeline), (frames, centers, scales)


def bench_once(batch_size: int, warmup: int = 5, iters: int = 30) -> float:
    fn, args = build_pipeline(batch_size)
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    print(f"# compile: {time.perf_counter() - t0:.1f}s", flush=True)
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    median = float(np.median(times))
    return batch_size / median


def main():
    bs = int(os.environ.get("BENCH_BATCH", "256"))
    iters = int(os.environ.get("BENCH_ITERS", "30"))
    cps = bench_once(bs, iters=iters)
    print(f"# batch {bs}: {cps:,.0f} crops/s", flush=True)
    result = {
        "metric": "crops_per_sec_per_chip_e2e_256x192",
        "value": round(cps, 1),
        "unit": "crops/s",
        "vs_baseline": round(cps / BASELINE_IMG_PER_S, 2),
        "batch_size": bs,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Training-step throughput benchmark (crops/sec/chip, fused train step).

Companion to bench.py for the training path: on-device Gaussian target
generation + bf16 forward + 6-term fusion loss + backward + AdamW update,
measured with the same chained-fori protocol (see bench.py for why).

Prints one JSON line. Env knobs:
  BENCH_BATCH (128), BENCH_CHAIN (48)
  BENCH_BACKBONE (hrnet_w32 | hrnet_w48 | hrformer_base | hrformer_small)
  BENCH_PALLAS  (1: fused Pallas W-MSA for hrformer; 0: XLA path)
  BENCH_ACCUM   (grad_accum_steps; microbatch = BENCH_BATCH / accum)

MFU is reported from published per-crop forward-FLOP figures at 256x192
(backward ~2x forward): HRNet-W32 7.1G / W48 14.6G
(/root/reference/analysis/hrnet_vs_sota_analysis.md:15-24), HRFormer-Base
12.2G / Small 2.8G (HRFormer paper, table 5) — against the v5e bf16 peak
of 197 TFLOP/s measured by the chained-matmul calibration (BENCH.md).
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PEAK_BF16 = 197e12
FLOPS_FWD_PER_CROP = {
    "hrnet_w32": 7.1e9,
    "hrnet_w48": 14.6e9,
    "hrformer_base": 12.2e9,
    "hrformer_small": 2.8e9,
    "litehrnet": 0.31e9,
}


def main():
    from infantposeestimation_gaussianbias_tpu.config import Config
    from infantposeestimation_gaussianbias_tpu.models import build_model
    from infantposeestimation_gaussianbias_tpu.train import (
        create_train_state,
        make_train_step,
    )

    B = int(os.environ.get("BENCH_BATCH", "128"))
    K_CHAIN = int(os.environ.get("BENCH_CHAIN", "48"))
    backbone = os.environ.get("BENCH_BACKBONE", "hrnet_w32")
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    accum = int(os.environ.get("BENCH_ACCUM", "1"))

    cfg = Config()
    cfg.model.backbone = backbone
    cfg.model.head_type = "fusion"
    cfg.model.compute_dtype = "bfloat16"
    cfg.model.use_pallas = use_pallas
    cfg.model.remat = os.environ.get("BENCH_REMAT", "0") == "1"
    cfg.model.hrformer_window_size = int(os.environ.get("BENCH_WS", "7"))
    cfg.train.steps_per_epoch = 1000
    cfg.train.grad_accum_steps = accum
    # BENCH_INPUT="W,H": train at the reference's second resolution
    # (288,384 for the *_384 configs, README.md:227-229).
    W_in, H_in = (int(v) for v in os.environ.get(
        "BENCH_INPUT", "192,256").split(","))
    cfg.data.input_size = (W_in, H_in)
    cfg.data.heatmap_size = (W_in // 4, H_in // 4)

    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    step = make_train_step(cfg, cfg.data.keypoint_schema)

    rng = np.random.RandomState(0)
    K = cfg.data.num_keypoints
    kpx = rng.uniform(10, W_in - 12, (B, K, 1))
    kpy = rng.uniform(10, H_in - 12, (B, K, 1))
    batch = {
        "image": jnp.asarray(
            rng.randn(B, H_in, W_in, 3).astype(np.float32)),
        "keypoints": jnp.asarray(
            np.concatenate([kpx, kpy], axis=-1).astype(np.float32)),
        "visible": jnp.ones((B, K), jnp.float32),
    }

    def chained(k):
        @jax.jit
        def run(state, batch, key):
            def body(i, carry):
                st, acc = carry
                st, metrics = step(st, batch, jax.random.fold_in(key, i))
                return st, acc + metrics["total_loss"]
            st, acc = jax.lax.fori_loop(0, k, body, (state, 0.0))
            return acc
        return run

    args = (state, batch, jax.random.PRNGKey(1))

    def timed(fn, reps=4):
        float(fn(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    # Two-point protocol with a long second chain: short chains (the old
    # 1-vs-8) leave startup/teardown amortized over too few iterations
    # and read ~10% high vs probe_train.py's 8-vs-56 measurement.
    K0 = 8
    t1 = timed(chained(K0))
    tk = timed(chained(K0 + K_CHAIN))
    per = (tk - t1) / K_CHAIN
    print(f"# T_{K0}={t1 * 1e3:.1f}ms T_{K0 + K_CHAIN}={tk * 1e3:.1f}ms "
          f"-> {per * 1e3:.2f}ms/step of {B}", flush=True)
    out = {
        "metric": f"train_crops_per_sec_per_chip_{H_in}x{W_in}",
        "value": round(B / per, 1),
        "unit": "crops/s",
        "batch_size": B,
        "ms_per_step": round(per * 1e3, 2),
        "backbone": backbone,
        "grad_accum_steps": accum,
        "device": str(jax.devices()[0]),
    }
    if backbone.startswith("hrformer"):
        out["pallas"] = use_pallas
    fwd = FLOPS_FWD_PER_CROP.get(backbone)
    if fwd:
        # published figures are at 256x192; conv/attention FLOPs scale
        # linearly with pixel count.  fwd + ~2x fwd for the backward.
        fwd = fwd * (H_in * W_in) / (256 * 192)
        out["mfu_pct"] = round(B * 3 * fwd / per / PEAK_BF16 * 100, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Training-step decomposition probe (round-2 perf work, VERDICT #8).

Round 1 measured the fused HRNet-W32 + fusion train step at 139.8 ms
(batch 128, bf16) = 916 crops/s with no breakdown.  This probe times the
pieces under the chained two-point protocol:

  - target generation alone
  - forward alone (train-mode, batch stats)
  - forward + loss
  - forward + loss + backward (grads, no optimizer)
  - full step (targets + jitter + fwd + loss + bwd + AdamW + grad norm)
  - full step with jax.checkpoint (remat) over the model apply

and reports training MFU from the model FLOP estimate (fwd ~7.1
GFLOP/crop; bwd ~2x fwd).

Usage: python -m infantposeestimation_gaussianbias_tpu.tools.probe_train
Env: PROBE_BATCH (default 128); PROBE_ONLY (comma list of row substrings
to run, e.g. "full step").
"""

from __future__ import annotations

import os
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

_cache = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PEAK_BF16 = 197e12


def chained_time_state(step, state0, batch, k: int = 48, K0: int = 8,
                       repeats: int = 5):
    """Per-iter seconds for step(state, batch, i) -> state (threading the
    mutated state through the chain keeps a real data dependency)."""

    def run(n):
        @jax.jit
        def f(state, batch):
            def body(i, s):
                return step(s, batch, i)
            s = lax.fori_loop(0, n, body, state)
            return sum(jnp.sum(jnp.asarray(t, jnp.float32))
                       for t in jax.tree_util.tree_leaves(s.params))
        return f

    def timed(g):
        float(g(state0, batch))
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(g(state0, batch))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1 = timed(run(K0))
    tk = timed(run(K0 + k))
    return (tk - t1) / k


def chained_time_fn(fn, x0, k: int = 48, K0: int = 8, repeats: int = 5):
    """Per-iter seconds for fn(x) -> anything, scalar-feedback chained."""

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


def _wanted(name: str) -> bool:
    only = os.environ.get("PROBE_ONLY", "")
    return not only or any(s.strip() in name for s in only.split(","))


def report(name, sec, B, flops_per_crop=None):
    mfu = ""
    if flops_per_crop:
        mfu = f"  MFU={B * flops_per_crop / sec / PEAK_BF16 * 100:5.1f}%"
    print(f"{name:44s} {sec * 1e3:8.2f} ms  ({B / sec:7.0f} crops/s){mfu}",
          flush=True)


def main():
    from ..config import Config
    from ..models import build_model
    from ..ops import heatmap as heatmap_ops
    from ..train.step import create_train_state, make_loss_fn, make_train_step

    B = int(os.environ.get("PROBE_BATCH", "128"))
    cfg = Config()
    cfg.model.backbone = "hrnet_w32"
    cfg.model.head_type = "fusion"
    cfg.model.compute_dtype = "bfloat16"
    cfg.model.remat = os.environ.get("PROBE_REMAT", "0") == "1"
    cfg.data.input_size = (192, 256)
    cfg.data.heatmap_size = (48, 64)
    schema = cfg.data.keypoint_schema
    print(f"device={jax.devices()[0]}  batch={B}  bf16", flush=True)

    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randn(B, 256, 192, 3).astype(np.float32)),
        "keypoints": jnp.asarray(
            rng.uniform(10, 180, (B, 17, 2)).astype(np.float32)),
        "visible": jnp.asarray(
            rng.randint(1, 3, (B, 17)).astype(np.float32)),
    }

    # fwd FLOPs: 7.1 GFLOP/crop (BENCH.md); bwd approx 2x fwd.
    FWD = 7.1e9
    STEP = 3 * FWD

    # 1) target generation alone
    if _wanted("targets"):
        sec = chained_time_fn(
            lambda b: heatmap_ops.generate_targets(
                b["keypoints"], b["visible"], tuple(cfg.data.heatmap_size),
                tuple(cfg.data.input_size), cfg.data.sigma, "msra"),
            batch)
        report("targets (msra gaussians)", sec, B)

    # 2) forward only (train mode, mutable batch stats)
    def fwd(images):
        out, _ = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)})
        return out["heatmaps"]

    if _wanted("forward (train mode)"):
        report("forward (train mode)",
               chained_time_fn(fwd, batch["image"]), B, FWD)

    # eval-mode forward for reference
    def fwd_eval(images):
        return state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, False)["heatmaps"]

    if _wanted("forward (eval mode)"):
        report("forward (eval mode)",
               chained_time_fn(fwd_eval, batch["image"]), B, FWD)

    # 3) forward + loss + backward (no optimizer)
    loss_fn = make_loss_fn(cfg, schema)
    target, weight = heatmap_ops.generate_targets(
        batch["keypoints"], batch["visible"], tuple(cfg.data.heatmap_size),
        tuple(cfg.data.input_size), cfg.data.sigma, "msra")

    def fwd_loss_bwd(images):
        def compute(params):
            out, _ = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                images, True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)})
            loss, _ = loss_fn(out, batch, target, weight)
            return loss
        return jax.grad(compute)(state.params)

    if _wanted("fwd+loss+bwd"):
        report("fwd+loss+bwd",
               chained_time_fn(fwd_loss_bwd, batch["image"]), B, STEP)

    # 4) full fused step
    train_step = make_train_step(cfg, schema)

    def full(s, b, i):
        s2, _ = train_step(s, b, jax.random.fold_in(jax.random.PRNGKey(1),
                                                    i))
        return s2

    if _wanted("full step"):
        report("full step (tg+jitter+fwd+loss+bwd+adamw)",
               chained_time_state(full, state, batch), B, STEP)

    # 5) decomposition: model-bwd vs loss-bwd.
    # (a) same model, MSE-only loss on the heatmap branch — isolates the
    #     model backward (loss bwd of plain MSE is ~free)
    from ..losses import keypoint_mse_loss

    def fwd_mse_bwd(images):
        def compute(params):
            out, _ = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                images, True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)})
            return keypoint_mse_loss(out["heatmaps"], target, weight, True)
        return jax.grad(compute)(state.params)

    if _wanted("MSE-only"):
        report("fwd+MSE-only+bwd (model bwd isolated)",
               chained_time_fn(fwd_mse_bwd, batch["image"]), B, STEP)

    # (b) loss fwd+bwd alone wrt the head OUTPUTS (no model) — isolates
    #     the 6-term fusion loss's own backward
    out0, _ = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["image"], True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(0)})
    out0 = {k: v for k, v in out0.items()}

    def loss_only_bwd(outs):
        def compute(o):
            loss, _ = loss_fn(o, batch, target, weight)
            return loss
        return jax.grad(compute)(outs)

    if _wanted("loss alone"):
        report("fusion loss fwd+bwd alone (wrt outputs)",
               chained_time_fn(loss_only_bwd, out0), B)


if __name__ == "__main__":
    main()

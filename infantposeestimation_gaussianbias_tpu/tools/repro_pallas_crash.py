"""Staged repro for the round-4 TPU worker crash seen with
BENCH_BACKBONE=hrformer_small BENCH_PALLAS=1 bench_train.py.

The same kernel at the same batch passed the round-2 backbone fwd+bwd
measurement (BENCH.md), so the fault is either (a) tunnel flakiness,
(b) something only the FULL train step triggers (heads/loss/optimizer/
donation), or (c) a shape reached only by the full model.  Run stages
in order; each prints OK so the first crash localizes the trigger.

  STAGE=kern   fused W-MSA fwd+bwd at every per-branch training shape
  STAGE=bbone  backbone-only fwd+bwd (the round-2 configuration)
  STAGE=step   one full fused train step (bench_train configuration)

Env: STAGE (default kern), BATCH (128), BACKBONE (hrformer_small).
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np


def branch_shapes(backbone: str, batch: int, hw=(256, 192), window: int = 7):
    """(nW, N, C, H) per transformer branch, matching window_partition."""
    if backbone == "hrformer_small":
        chans, heads = (32, 64, 128, 256), (1, 2, 4, 8)
    else:
        chans, heads = (78, 156, 312, 624), (2, 4, 8, 16)
    out = []
    for i, (c, h) in enumerate(zip(chans, heads)):
        hh = hw[0] // (4 * 2**i)
        ww = hw[1] // (4 * 2**i)
        nwin = math.ceil(hh / window) * math.ceil(ww / window)
        out.append((batch * nwin, window * window, c, h))
    return out


def stage_kern(backbone: str, batch: int) -> None:
    from ..ops.pallas.window_msa import window_attention_pallas_qkv_vjp

    for nW, N, C, H in branch_shapes(backbone, batch):
        key = jax.random.PRNGKey(0)
        qkv = jax.random.normal(key, (nW, N, 3 * C), jnp.bfloat16)
        bias = jax.random.normal(key, (H, N, N), jnp.float32)

        def loss(qkv, bias):
            o = window_attention_pallas_qkv_vjp(qkv, bias, H)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(loss, argnums=(0, 1)))(qkv, bias)
        jax.block_until_ready(g)
        gn = float(jnp.linalg.norm(g[1]))
        assert np.isfinite(gn), f"non-finite dbias at {(nW, N, C, H)}"
        print(f"kern OK nW={nW} N={N} C={C} H={H} |dbias|={gn:.3f}")


def stage_bbone(backbone: str, batch: int) -> None:
    from ..models import hrformer as hrf

    factory = getattr(hrf, backbone)
    model = factory(dtype=jnp.bfloat16, use_pallas=True)
    x = jnp.zeros((batch, 256, 192, 3), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, train=True)

    def loss(params):
        feats, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)})
        y = feats[0] if isinstance(feats, (list, tuple)) else feats
        return jnp.mean(y.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss))(variables["params"])
    jax.block_until_ready(g)
    print(f"bbone OK {backbone} b={batch}")


def stage_step(backbone: str, batch: int) -> None:
    import importlib
    bench = importlib.import_module("bench_train")
    os.environ["BENCH_BACKBONE"] = backbone
    os.environ["BENCH_BATCH"] = str(batch)
    os.environ["BENCH_PALLAS"] = "1"
    os.environ["BENCH_CHAIN"] = "4"
    bench.main()


def main() -> None:
    stage = os.environ.get("STAGE", "kern")
    batch = int(os.environ.get("BATCH", "128"))
    backbone = os.environ.get("BACKBONE", "hrformer_small")
    print(f"# repro stage={stage} backbone={backbone} batch={batch} "
          f"device={jax.devices()[0].device_kind}")
    {"kern": stage_kern, "bbone": stage_bbone, "step": stage_step}[
        stage](backbone, batch)


if __name__ == "__main__":
    main()

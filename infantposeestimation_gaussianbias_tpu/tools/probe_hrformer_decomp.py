"""HRFormer training-step decomposition (round-5, VERDICT #1).

The round-4 matrix showed hrformer_small training at 442.8 ms/step
(1.2% MFU) — the reference's DEFAULT config
(/root/reference/configs/config.py:48).  Before attacking, decompose:

  level 1 — step pieces: backbone fwd (eval), backbone fwd (train),
            backbone fwd+bwd, full train step (from bench_train);
  level 2 — per-branch transformer blocks at their real shapes
            (fwd and fwd+bwd), scaled by block counts, so the
            residual vs the backbone number isolates the conv
            stem/transition/fuse cost;
  level 3 — in-block components at each branch shape: LayerNorm,
            window partition+reverse relayout, qkv+proj Dense,
            attention core (XLA vs Pallas), MLP.

Everything uses the chained-fori two-point protocol (see bench.py for
why host timing is unusable over the tunnel).

Usage: python -m ...tools.probe_hrformer_decomp
Env: PROBE_BATCH (128), PROBE_MODEL (hrformer_small),
     PROBE_LEVELS (comma list from {step,block,comp}; default all).
"""

from __future__ import annotations

import math
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


def chained_time(fn, args, k: int = 32, K0: int = 4, repeats: int = 3):
    """Median device-time per call of fn(*args) via two-point chaining.

    fn must accept args and return an array (or pytree); a tiny function
    of the output perturbs the first argument so XLA cannot collapse the
    loop."""
    def run(n):
        @jax.jit
        def f(*a):
            x0 = a[0]

            def body(i, carry):
                x, acc = carry
                y = fn(x, *a[1:])
                s = sum(jnp.sum(jnp.asarray(t, jnp.float32))
                        for t in jax.tree_util.tree_leaves(y))
                return x0 + (1e-20 * s).astype(x0.dtype), acc + s

            _, acc = lax.fori_loop(0, n, body, (x0, jnp.float32(0)))
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


def branch_geometry(name: str, hw=(256, 192), window: int = 7):
    """Per-branch (C, heads, H, W, nW, blocks_total) for the 4 branches."""
    if name == "hrformer_small":
        chans, heads = (32, 64, 128, 256), (1, 2, 4, 8)
    else:
        chans, heads = (78, 156, 312, 624), (2, 4, 8, 16)
    # stage_modules (1, 4, 2); branch i participates in stages >= i+2
    # (branch 0/1 from stage 2; branch 2 from stage 3; branch 3 stage 4),
    # 2 blocks per module appearance.
    appearances = [1 + 4 + 2, 1 + 4 + 2, 4 + 2, 2]
    out = []
    for i, (c, h) in enumerate(zip(chans, heads)):
        hh = hw[0] // (4 * 2 ** i)
        ww = hw[1] // (4 * 2 ** i)
        nwin = math.ceil(hh / window) * math.ceil(ww / window)
        out.append(dict(C=c, heads=h, H=hh, W=ww, nwin=nwin,
                        blocks=2 * appearances[i]))
    return out


def level_step(name: str, B: int):
    from ..models import BACKBONES

    x = jnp.asarray(np.random.RandomState(0).randn(B, 256, 192, 3),
                    jnp.bfloat16)
    for use_pallas in (False,):
        model = BACKBONES[name](dtype=jnp.bfloat16, use_pallas=use_pallas)
        variables = jax.jit(lambda r, v: model.init(r, v, False))(
            jax.random.PRNGKey(0), x[:1])
        params = variables["params"]
        stats = variables.get("batch_stats")

        sec = chained_time(lambda v: model.apply(variables, v, False), (x,))
        print(f"L1 {name} backbone fwd(eval)   xla {sec*1e3:8.2f} ms",
              flush=True)

        def fwd_train(v):
            out, _ = model.apply(
                {"params": params, "batch_stats": stats}, v, True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)})
            return out

        sec = chained_time(fwd_train, (x,))
        print(f"L1 {name} backbone fwd(train)  xla {sec*1e3:8.2f} ms",
              flush=True)

        def fwd_bwd(v):
            def compute(p):
                out, _ = model.apply(
                    {"params": p, "batch_stats": stats}, v, True,
                    mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(0)})
                return jnp.sum(jnp.square(out.astype(jnp.float32)))
            return jax.grad(compute)(params)

        sec = chained_time(fwd_bwd, (x,))
        print(f"L1 {name} backbone fwd+bwd     xla {sec*1e3:8.2f} ms",
              flush=True)


def _time_module(mod, x, train: bool, bwd: bool, extra_rngs=True):
    rngs = {"params": jax.random.PRNGKey(0)}
    init_kw = {}
    variables = mod.init(rngs, x, train) if _takes_train(mod) \
        else mod.init(rngs, x)
    params = variables["params"]
    stats = variables.get("batch_stats")

    def apply_fn(v, p):
        var = {"params": p}
        if stats is not None:
            var["batch_stats"] = stats
        kw = dict(mutable=["batch_stats"]) if (train and stats is not None) \
            else {}
        r = {"dropout": jax.random.PRNGKey(1)} if train else {}
        out = mod.apply(var, v, train, rngs=r, **kw) if _takes_train(mod) \
            else mod.apply(var, v, rngs=r, **kw)
        if isinstance(out, tuple):
            out = out[0]
        return out

    if not bwd:
        return chained_time(lambda v: apply_fn(v, params), (x,))

    def fwd_bwd(v):
        def compute(p):
            out = apply_fn(v, p)
            return jnp.sum(jnp.square(jnp.asarray(out, jnp.float32)))
        return jax.grad(compute)(params)

    return chained_time(fwd_bwd, (x,))


def _takes_train(mod):
    import inspect
    try:
        sig = inspect.signature(type(mod).__call__)
        return "train" in sig.parameters
    except (ValueError, TypeError):
        return True


def level_block(name: str, B: int):
    from ..models.hrformer import HRFormerBlock

    geo = branch_geometry(name)
    tot_f = tot_b = 0.0
    for i, g in enumerate(geo):
        x = jnp.asarray(
            np.random.RandomState(i).randn(B, g["H"], g["W"], g["C"]),
            jnp.bfloat16)
        blk = HRFormerBlock(g["C"], g["heads"], dtype=jnp.bfloat16,
                            use_pallas=False)
        f = _time_module(blk, x, train=True, bwd=False)
        b = _time_module(blk, x, train=True, bwd=True)
        tot_f += f * g["blocks"]
        tot_b += b * g["blocks"]
        print(f"L2 branch{i} C={g['C']:4d} {g['H']}x{g['W']} "
              f"x{g['blocks']:2d} blocks: fwd {f*1e3:7.3f} ms "
              f"fwd+bwd {b*1e3:7.3f} ms  (totals {f*g['blocks']*1e3:7.1f} / "
              f"{b*g['blocks']*1e3:7.1f} ms)", flush=True)
    print(f"L2 {name} all-blocks total: fwd {tot_f*1e3:8.1f} ms  "
          f"fwd+bwd {tot_b*1e3:8.1f} ms", flush=True)


def level_comp(name: str, B: int):
    from ..ops import msa
    from ..ops.pallas.window_msa import window_attention_pallas_qkv

    geo = branch_geometry(name)
    ws = 7
    N = ws * ws
    on_tpu = jax.devices()[0].platform != "cpu"

    for i, g in enumerate(geo):
        C, h = g["C"], g["heads"]
        hd = C // h
        rng = np.random.RandomState(i)
        x = jnp.asarray(rng.randn(B, g["H"], g["W"], C), jnp.bfloat16)
        nW = B * g["nwin"]
        wins = jnp.asarray(rng.randn(nW, N, C), jnp.bfloat16)
        qkv = jnp.asarray(rng.randn(nW, N, 3 * C), jnp.bfloat16)
        bias = jnp.asarray(rng.randn(h, N, N), jnp.float32)

        rows = {}
        rows["ln_f32"] = chained_time(
            lambda v: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
            .apply(nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
                   .init(jax.random.PRNGKey(0), v), v), (x,))

        def part_rev(v):
            w, (Hp, Wp) = msa.window_partition(v, ws)
            w = w * jnp.bfloat16(1.0000001)  # keep both directions live
            return msa.window_reverse(
                w.reshape(-1, ws, ws, C), ws, g["H"], g["W"], Hp, Wp)

        rows["part+rev"] = chained_time(part_rev, (x,))

        dense_qkv = nn.Dense(3 * C, dtype=jnp.bfloat16)
        vq = dense_qkv.init(jax.random.PRNGKey(0), wins)
        dense_proj = nn.Dense(C, dtype=jnp.bfloat16)
        vp = dense_proj.init(jax.random.PRNGKey(0), wins)
        rows["qkv+proj"] = chained_time(
            lambda v: dense_proj.apply(
                vp, dense_qkv.apply(vq, v)[..., :C]), (wins,))

        def attn_xla(qk):
            t = qk.reshape(nW, N, 3, h, hd).transpose(2, 0, 3, 1, 4)
            o = msa.window_attention(t[0], t[1], t[2], bias)
            return o.transpose(0, 2, 1, 3).reshape(nW, N, C)

        rows["attn_xla"] = chained_time(attn_xla, (qkv,))
        if on_tpu:
            rows["attn_pallas"] = chained_time(
                lambda qk: window_attention_pallas_qkv(qk, bias, h), (qkv,))

        mlp_fc1 = nn.Dense(4 * C, dtype=jnp.bfloat16)
        v1 = mlp_fc1.init(jax.random.PRNGKey(0), wins)
        mlp_fc2 = nn.Dense(C, dtype=jnp.bfloat16)
        hidden = jnp.zeros(wins.shape[:-1] + (4 * C,), jnp.bfloat16)
        v2 = mlp_fc2.init(jax.random.PRNGKey(0), hidden)
        rows["mlp"] = chained_time(
            lambda v: mlp_fc2.apply(
                v2, nn.gelu(mlp_fc1.apply(v1, v), approximate=False)),
            (wins,))

        parts = "  ".join(f"{k} {v*1e3:7.3f}" for k, v in rows.items())
        print(f"L3 branch{i} C={C:4d}: {parts}  (ms, fwd only)", flush=True)


def main():
    B = int(os.environ.get("PROBE_BATCH", "128"))
    name = os.environ.get("PROBE_MODEL", "hrformer_small")
    levels = os.environ.get("PROBE_LEVELS", "step,block,comp").split(",")
    print(f"device={jax.devices()[0]} batch={B} model={name}", flush=True)
    if "step" in levels:
        level_step(name, B)
    if "block" in levels:
        level_block(name, B)
    if "comp" in levels:
        level_comp(name, B)


if __name__ == "__main__":
    main()

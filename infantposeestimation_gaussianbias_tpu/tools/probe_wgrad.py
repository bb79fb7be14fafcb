"""Weight-gradient orientation probe (round-3 perf work, VERDICT #2).

probe_bwd.py localized the training backward overhang to the C=32
branch-conv weight gradients: XLA's dW conv contracts over B*H*W but
emits the output as (kh*kw*ci, co) with co=32 on the MXU lane dim —
25% lane utilization.  This probe times, per branch shape:

  fwd       the forward conv
  vjp       full fwd+bwd (both grads) via jax.vjp
  dx        data-grad alone (transposed conv — same lane count as fwd)
  dw_xla    weight-grad alone, XLA's native emission
  dw_t      weight-grad via the TRANSPOSED matmul orientation:
            dW^T = dY^T @ X_patches, N = kh*kw*ci lanes (>=288)
            using conv_general_dilated_patches for X_patches
  dw_tap    weight-grad as 9 per-tap slices, avoiding the patch
            materialization: dW[t] = einsum('bhwi,bhwo->oi', x_t, dy)
            batched as one (9*ci)-lane matmul via concat of shifts

Usage: python -m infantposeestimation_gaussianbias_tpu.tools.probe_wgrad
Env: PROBE_BATCH (default 128).
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


def chained_time(make_out, args, k: int = 256, K0: int = 32, repeats: int = 5):
    """Two-point chained protocol: device ms per iteration of make_out."""

    def run(n):
        @jax.jit
        def f(args):
            def body(i, carry):
                a, acc = carry
                y = make_out(a)
                s = sum(jnp.sum(t.astype(jnp.float32))
                        for t in jax.tree_util.tree_leaves(y))
                a = jax.tree_util.tree_map(
                    lambda t: t + (1e-20 * s).astype(t.dtype), a)
                return a, acc + s
            _, acc = lax.fori_loop(0, n, body, (args, jnp.float32(0)))
            return acc
        return f

    def timed(g):
        float(g(args))
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(g(args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1 = timed(run(K0))
    tk = timed(run(k))
    return (tk - t1) / (k - K0) * 1e3


def conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def dw_transposed(x, dy, kh=3, kw=3):
    """dW via patches + transposed matmul: N = kh*kw*ci MXU lanes."""
    B, H, W, Ci = x.shape
    Co = dy.shape[-1]
    # (B, H, W, kh*kw*Ci) patches of the SAME-padded conv
    patches = lax.conv_general_dilated_patches(
        x, (kh, kw), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    p2 = patches.reshape(-1, kh * kw * Ci)
    d2 = dy.reshape(-1, Co)
    # (Co, kh*kw*Ci): co on the streamed M dim, taps*ci on lanes
    dwt = jax.lax.dot_general(
        d2, p2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # patches layout is channel-major per tap: (Ci, kh, kw) minor order
    dw = dwt.reshape(Co, Ci, kh, kw).transpose(2, 3, 1, 0)
    return dw


def dw_tap_shifts(x, dy, kh=3, kw=3):
    """dW per tap via shifted slices (no 9x patch materialization in HBM;
    XLA may fuse the shifts): one (9*ci)-lane matmul on concatenated
    shifted views."""
    B, H, W, Ci = x.shape
    Co = dy.shape[-1]
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    shifts = [xp[:, i:i + H, j:j + W, :]
              for i in range(kh) for j in range(kw)]
    xs = jnp.concatenate(shifts, axis=-1).reshape(-1, kh * kw * Ci)
    d2 = dy.reshape(-1, Co)
    dwt = jax.lax.dot_general(
        d2, xs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return dwt.reshape(Co, kh, kw, Ci).transpose(1, 2, 3, 0)


def main():
    B = int(os.environ.get("PROBE_BATCH", "128"))
    shapes = [
        ("branch0 64x48 C32", (B, 64, 48, 32), 32),
        ("branch1 32x24 C64", (B, 32, 24, 64), 64),
        ("branch2 16x12 C128", (B, 16, 12, 128), 128),
        ("stem 128x96 C64", (B, 128, 96, 64), 64),
    ]
    rng = np.random.RandomState(0)
    print(f"# weight-grad orientation probe, b{B}, bf16, "
          f"{jax.devices()[0]}", flush=True)
    print(f"{'shape':22s} {'fwd':>7s} {'vjp':>7s} {'dx':>7s} "
          f"{'dw_xla':>7s} {'dw_t':>7s} {'dw_tap':>7s}")
    for name, xshape, co in shapes:
        x = jnp.asarray(rng.randn(*xshape).astype(np.float32),
                        jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, xshape[-1], co)
                        .astype(np.float32) * 0.05, jnp.bfloat16)
        dy = jnp.asarray(rng.randn(*xshape[:3], co).astype(np.float32),
                         jnp.bfloat16)

        t_fwd = chained_time(lambda a: conv(a[0], a[1]), (x, w))

        def vjp_both(a):
            _, pull = jax.vjp(conv, a[0], a[1])
            return pull(a[2])
        t_vjp = chained_time(vjp_both, (x, w, dy))

        def dx_only(a):
            return jax.vjp(lambda xx: conv(xx, a[1]), a[0])[1](a[2])
        t_dx = chained_time(dx_only, (x, w, dy))

        def dw_only(a):
            return jax.vjp(lambda ww: conv(a[0], ww), a[1])[1](a[2])
        t_dw = chained_time(dw_only, (x, w, dy))

        t_dwt = chained_time(lambda a: dw_transposed(a[0], a[2]),
                             (x, w, dy))
        t_dwtap = chained_time(lambda a: dw_tap_shifts(a[0], a[2]),
                               (x, w, dy))

        # correctness cross-check (f32 reference tolerances at bf16 inputs)
        ref = np.asarray(jax.vjp(lambda ww: conv(x, ww), w)[1](dy)[0],
                         np.float32)
        got_t = np.asarray(dw_transposed(x, dy), np.float32)
        got_tap = np.asarray(dw_tap_shifts(x, dy), np.float32)
        scale = np.abs(ref).max() + 1e-6
        err_t = np.abs(got_t - ref).max() / scale
        err_tap = np.abs(got_tap - ref).max() / scale
        assert err_t < 5e-2, (name, err_t)
        assert err_tap < 5e-2, (name, err_tap)

        print(f"{name:22s} {t_fwd:7.3f} {t_vjp:7.3f} {t_dx:7.3f} "
              f"{t_dw:7.3f} {t_dwt:7.3f} {t_dwtap:7.3f}", flush=True)

    # -- BasicBlock-level decomposition: where does the 2.9x bwd/fwd live?
    # conv-only chain vs conv+BN(+relu) chain, fwd and full vjp, at the
    # branch0 shape.  BN in training mode (batch statistics), as a pure fn.
    def bn(x, scale, bias):
        m = jnp.mean(x.astype(jnp.float32), axis=(0, 1, 2))
        v = jnp.var(x.astype(jnp.float32), axis=(0, 1, 2))
        y = (x.astype(jnp.float32) - m) * jax.lax.rsqrt(v + 1e-5)
        return (y * scale + bias).astype(x.dtype)

    name, xshape, co = shapes[0]
    x = jnp.asarray(rng.randn(*xshape).astype(np.float32), jnp.bfloat16)
    Ci = xshape[-1]
    w1 = jnp.asarray(rng.randn(3, 3, Ci, co).astype(np.float32) * 0.05,
                     jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(3, 3, co, co).astype(np.float32) * 0.05,
                     jnp.bfloat16)
    sc = jnp.ones((co,), jnp.float32)
    bi = jnp.zeros((co,), jnp.float32)
    dy = jnp.asarray(rng.randn(*xshape[:3], co).astype(np.float32),
                     jnp.bfloat16)

    def block_convs(a):
        h = jax.nn.relu(conv(a[0], a[1]))
        return jax.nn.relu(conv(h, a[2]) + a[0])

    def block_full(a):
        h = jax.nn.relu(bn(conv(a[0], a[1]), a[3], a[4]))
        return jax.nn.relu(bn(conv(h, a[2]), a[3], a[4]) + a[0])

    for label, f, args in (
            ("block conv+relu", block_convs, (x, w1, w2)),
            ("block conv+BN+relu", block_full, (x, w1, w2, sc, bi))):
        t_f = chained_time(lambda a: f(a), args)

        def vjp_all(a):
            _, pull = jax.vjp(f, a)
            return pull(dy)
        t_v = chained_time(vjp_all, args)
        print(f"{label:22s} fwd {t_f:7.3f}  vjp {t_v:7.3f}  "
              f"bwd/fwd {(t_v - t_f) / max(t_f, 1e-9):5.2f}", flush=True)


if __name__ == "__main__":
    main()

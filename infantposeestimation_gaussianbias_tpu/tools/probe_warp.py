"""Rotated-warp strategy benchmark (round-2, VERDICT #7).

Compares the three on-device warp implementations at the training-crop
shape (512x512 source -> 256x192 crop, per-sample rotations):

  - warp_affine_batch:    4-tap joint 2-D gather (cv2-exact)
  - warp_affine_twopass:  two single-axis 2-tap gathers (Catmull-Smith)
  - warp_affine_separable (rot=0 reference point): two MXU matmuls

Usage: python -m infantposeestimation_gaussianbias_tpu.tools.probe_warp
Env: PROBE_BATCH (default 256).
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
    from ..ops import affine

    B = int(os.environ.get("PROBE_BATCH", "256"))
    print(f"device={jax.devices()[0]}  batch={B}  "
          f"512x512 -> 256x192 f32", flush=True)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 255, (B, 512, 512, 3))
                       .astype(np.float32))
    centers = jnp.asarray(rng.uniform(128, 384, (B, 2)).astype(np.float32))
    scales = jnp.asarray(np.repeat(rng.uniform(150, 400, (B, 1)), 2, 1)
                         .astype(np.float32))
    rots = jnp.asarray(rng.uniform(-40, 40, (B,)).astype(np.float32))
    mats_rot = affine.get_affine_matrix(centers, scales, (192, 256), rots)
    mats_0 = affine.get_affine_matrix(centers, scales, (192, 256), 0.0)

    for name, fn, mats in (
        ("2-D gather (warp_affine_batch)",
         affine.warp_affine_batch, mats_rot),
        ("two-pass 1-D gathers (warp_affine_twopass)",
         affine.warp_affine_twopass, mats_rot),
        ("MXU separable rot=0 (reference point)",
         affine.warp_affine_separable, mats_0),
    ):
        sec = chained_time(lambda x, f=fn, m=mats: f(x, m, 192, 256), imgs)
        print(f"{name:46s} {sec * 1e3:8.2f} ms  ({B / sec:8.0f} crops/s)",
              flush=True)


if __name__ == "__main__":
    main()

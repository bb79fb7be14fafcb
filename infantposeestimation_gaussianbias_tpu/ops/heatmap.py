"""Gaussian heatmap target generation — vectorized, on device.

The reference generates targets with a per-keypoint Python loop pasting a
clipped (2*3sigma+1)^2 Gaussian window whose peak sits on an integer pixel
(/root/reference/datasets/coco_dataset.py:185-250, the classic MSRA scheme),
and Stack B additionally has a full-map `np.maximum` paste variant
(/root/reference/data/pose_transforms.py:385-457).  Both are reproduced
here as closed-form broadcasts over the (B, K, H, W) grid — one fused XLA
kernel, no loops, no host work.

Heatmap layout is (B, H, W, K) (NHWC, TPU-friendly).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def generate_targets(
    keypoints: jnp.ndarray,
    visible: jnp.ndarray,
    heatmap_size: Tuple[int, int],
    input_size: Tuple[int, int],
    sigma: float = 2.0,
    mode: str = "msra",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generate Gaussian heatmap targets.

    Args:
      keypoints: (B, K, 2) keypoint (x, y) in INPUT image pixels.
      visible: (B, K) visibility flags (0/1/2, COCO convention).
      heatmap_size: (W, H) of the target maps.
      input_size: (W, H) of the network input.
      sigma: Gaussian sigma in heatmap pixels.
      mode: "msra"  — integer-centered clipped window, exact parity with
                      /root/reference/datasets/coco_dataset.py:185-250;
            "exact" — sub-pixel-centered full-map Gaussian (unbiased,
                      Stack-B /root/reference/data/pose_transforms.py:395-414
                      semantics).

    Returns:
      targets: (B, H, W, K) float32 heatmaps.
      weights: (B, K) per-keypoint loss weights (the raw visibility value,
               zeroed when the Gaussian window falls fully outside the map —
               matching the reference, which propagates v=2 unchanged).
    """
    W, H = int(heatmap_size[0]), int(heatmap_size[1])
    in_w, in_h = float(input_size[0]), float(input_size[1])
    stride_x = in_w / W
    stride_y = in_h / H

    kpts = jnp.asarray(keypoints, jnp.float32)
    vis = jnp.asarray(visible, jnp.float32)

    mu_x = kpts[..., 0] / stride_x  # (B, K) heatmap-space
    mu_y = kpts[..., 1] / stride_y

    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = xs[None, :, :, None]  # (1, H, W, 1)
    ys = ys[None, :, :, None]

    if mode == "msra":
        tmp = sigma * 3.0
        # Reference: ul = int(mu - tmp); br = int(mu + tmp + 1); the window
        # Gaussian peaks at index size//2, i.e. map pixel ul + (2*tmp+1)//2.
        # int() truncates toward zero — replicate exactly.
        half = float((2.0 * tmp + 1.0) // 2.0)
        ul_x = jnp.trunc(mu_x - tmp)
        ul_y = jnp.trunc(mu_y - tmp)
        br_x = jnp.trunc(mu_x + tmp + 1.0)
        br_y = jnp.trunc(mu_y + tmp + 1.0)
        cx = ul_x + half  # integer-pixel Gaussian center
        cy = ul_y + half

        cxb = cx[:, None, None, :]
        cyb = cy[:, None, None, :]
        g = jnp.exp(-((xs - cxb) ** 2 + (ys - cyb) ** 2) / (2.0 * sigma**2))

        # Only pixels inside the reference's paste window [ul, br) receive
        # the Gaussian; the rest stay zero.
        in_win = ((xs >= ul_x[:, None, None, :]) & (xs < br_x[:, None, None, :]) &
                  (ys >= ul_y[:, None, None, :]) & (ys < br_y[:, None, None, :]))

        # Weight zeroing when the window misses the map entirely
        # (reference: ul >= size or br < 0 -> weight 0).
        off_map = ((ul_x >= W) | (ul_y >= H) | (br_x < 0) | (br_y < 0))
        vis_ok = vis >= 0.5
        weights = jnp.where(vis_ok & ~off_map, vis, 0.0)

        paint = vis_ok[:, None, None, :] & ~off_map[:, None, None, :] & in_win
        targets = jnp.where(paint, g, 0.0)
    elif mode == "exact":
        cxb = mu_x[:, None, None, :]
        cyb = mu_y[:, None, None, :]
        g = jnp.exp(-((xs - cxb) ** 2 + (ys - cyb) ** 2) / (2.0 * sigma**2))
        vis_ok = vis >= 0.5
        in_map = ((mu_x >= 0) & (mu_x < W) & (mu_y >= 0) & (mu_y < H))
        weights = jnp.where(vis_ok & in_map, vis, 0.0)
        targets = jnp.where((weights > 0)[:, None, None, :], g, 0.0)
    else:
        raise ValueError(f"Unknown target mode {mode!r}")

    return targets.astype(jnp.float32), weights.astype(jnp.float32)

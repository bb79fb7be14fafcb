"""Keypoint decoding ops — every reference decode path, vectorized on device.

The reference implements five decode flavours, all with per-(batch, keypoint)
Python loops:

* argmax + quarter "sign" shift         /root/reference/models/pose_estimator.py:330-373
* argmax + Taylor sub-pixel             /root/reference/utils/postprocess.py:37-75
* soft-argmax (global expectation)      /root/reference/models/fusion_head.py:24-71
* local Gaussian patch refinement       /root/reference/models/fusion_head.py:74-128
* window weighted-centroid refinement   /root/reference/utils/postprocess.py:138-184

Here each is a closed-form batched computation (gathers + reductions), which
XLA fuses into a handful of TPU kernels.  Heatmaps use the (B, H, W, K)
layout produced by NHWC convolutions.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def argmax_decode(heatmaps: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Plain argmax decode.

    Args:
      heatmaps: (B, H, W, K).
    Returns:
      coords (B, K, 2) in heatmap pixels (x, y); maxvals (B, K).

    Ties resolve to the lowest flat index over a row-major (H, W) scan,
    matching torch.max over the reference's (B, K, H*W) view.
    """
    B, H, W, K = heatmaps.shape
    flat = heatmaps.transpose(0, 3, 1, 2).reshape(B, K, H * W)
    idx = jnp.argmax(flat, axis=-1)
    maxvals = jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]
    xs = (idx % W).astype(jnp.float32)
    ys = (idx // W).astype(jnp.float32)
    return jnp.stack([xs, ys], axis=-1), maxvals


def _gather_hm(heatmaps: jnp.ndarray, xi: jnp.ndarray, yi: jnp.ndarray) -> jnp.ndarray:
    """Gather heatmaps[b, y, x, k] for per-(b, k) integer coords (B, K)."""
    B, H, W, K = heatmaps.shape
    xi = jnp.clip(xi, 0, W - 1)
    yi = jnp.clip(yi, 0, H - 1)
    flat = heatmaps.transpose(0, 3, 1, 2).reshape(B, K, H * W)
    lin = yi * W + xi
    return jnp.take_along_axis(flat, lin[..., None], axis=-1)[..., 0]


def quarter_shift_decode(heatmaps: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Argmax + 0.25 * sign(gradient) shift.

    Vectorized equivalent of PoseEstimator.decode_heatmaps
    (/root/reference/models/pose_estimator.py:330-373): the shift only applies
    strictly inside the border (0 < x < W-1, 0 < y < H-1).
    """
    B, H, W, K = heatmaps.shape
    coords, maxvals = argmax_decode(heatmaps)
    xi = coords[..., 0].astype(jnp.int32)
    yi = coords[..., 1].astype(jnp.int32)

    dx = _gather_hm(heatmaps, xi + 1, yi) - _gather_hm(heatmaps, xi - 1, yi)
    dy = _gather_hm(heatmaps, xi, yi + 1) - _gather_hm(heatmaps, xi, yi - 1)
    ok_x = (xi > 0) & (xi < W - 1) & (yi > 0) & (yi < H - 1)

    shift_x = jnp.where(ok_x, jnp.sign(dx) * 0.25, 0.0)
    shift_y = jnp.where(ok_x, jnp.sign(dy) * 0.25, 0.0)
    out = coords + jnp.stack([shift_x, shift_y], axis=-1)
    return out, maxvals


def taylor_decode(heatmaps: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Argmax + Taylor-expansion sub-pixel refinement.

    Vectorized equivalent of get_max_preds_with_subpixel
    (/root/reference/utils/postprocess.py:37-75): first/second finite
    differences at the peak, offset = d1 / (2|d2|) clipped to +-0.5, applied
    per axis only when the second derivative is negative and the peak is at
    least 2 pixels from every border (1 < p < size-1).
    """
    B, H, W, K = heatmaps.shape
    coords, maxvals = argmax_decode(heatmaps)
    xi = coords[..., 0].astype(jnp.int32)
    yi = coords[..., 1].astype(jnp.int32)

    c = _gather_hm(heatmaps, xi, yi)
    dx = _gather_hm(heatmaps, xi + 1, yi) - _gather_hm(heatmaps, xi - 1, yi)
    dy = _gather_hm(heatmaps, xi, yi + 1) - _gather_hm(heatmaps, xi, yi - 1)
    dxx = _gather_hm(heatmaps, xi + 1, yi) - 2 * c + _gather_hm(heatmaps, xi - 1, yi)
    dyy = _gather_hm(heatmaps, xi, yi + 1) - 2 * c + _gather_hm(heatmaps, xi, yi - 1)

    inside = (xi > 1) & (xi < W - 1) & (yi > 1) & (yi < H - 1)
    off_x = jnp.clip(dx / (2.0 * jnp.abs(dxx) + 1e-12), -0.5, 0.5)
    off_y = jnp.clip(dy / (2.0 * jnp.abs(dyy) + 1e-12), -0.5, 0.5)
    sx = jnp.where(inside & (dxx < 0), off_x, 0.0)
    sy = jnp.where(inside & (dyy < 0), off_y, 0.0)
    return coords + jnp.stack([sx, sy], axis=-1), maxvals


def soft_argmax(heatmaps: jnp.ndarray, beta: float = 1.0
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable soft-argmax (SoftArgmax2D,
    /root/reference/models/fusion_head.py:24-71).

    Softmax over the full H*W grid of beta-scaled logits; coords are the
    expectation of the pixel grid; scores are the raw heatmap max.
    """
    B, H, W, K = heatmaps.shape
    logits = (heatmaps * beta).astype(jnp.float32).reshape(B, H * W, K)
    probs = jax.nn.softmax(logits, axis=1).reshape(B, H, W, K)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)[None, :, :, None]
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)[None, :, :, None]
    x = jnp.sum(probs * xs, axis=(1, 2))  # (B, K)
    y = jnp.sum(probs * ys, axis=(1, 2))
    scores = jnp.max(heatmaps, axis=(1, 2))
    return jnp.stack([x, y], axis=-1), scores


def local_gaussian_refine(
    heatmaps: jnp.ndarray,
    coarse: jnp.ndarray,
    radius: int = 2,
) -> jnp.ndarray:
    """Softmax-weighted centroid over a (2r+1)^2 patch around the rounded
    coarse coordinate.

    Vectorized equivalent of LocalGaussianRefinement
    (/root/reference/models/fusion_head.py:74-128), which loops over (b, k).
    The reference truncates the patch at map borders (softmax over fewer
    elements); reproduced here by masking out-of-map taps to -inf before the
    softmax so they carry zero weight.
    """
    B, H, W, K = heatmaps.shape
    r = radius
    # round() is banker's rounding in torch and jnp alike.
    px = jnp.clip(jnp.round(coarse[..., 0]), 0, W - 1).astype(jnp.int32)  # (B,K)
    py = jnp.clip(jnp.round(coarse[..., 1]), 0, H - 1).astype(jnp.int32)

    offs = jnp.arange(-r, r + 1)
    win_x = px[..., None] + offs[None, None, :]                     # (B,K,w)
    win_y = py[..., None] + offs[None, None, :]
    valid_x = (win_x >= 0) & (win_x < W)
    valid_y = (win_y >= 0) & (win_y < H)
    gx = jnp.clip(win_x, 0, W - 1)
    gy = jnp.clip(win_y, 0, H - 1)

    # Gather the (2r+1, 2r+1) patches: (B, K, w, w).
    flat = heatmaps.transpose(0, 3, 1, 2).reshape(B, K, H * W)
    lin = gy[..., :, None] * W + gx[..., None, :]                   # (B,K,w,w)
    patches = jnp.take_along_axis(flat, lin.reshape(B, K, -1), axis=-1)
    patches = patches.reshape(B, K, 2 * r + 1, 2 * r + 1)

    valid = valid_y[..., :, None] & valid_x[..., None, :]
    logits = jnp.where(valid, patches.astype(jnp.float32), -jnp.inf)
    w = jax.nn.softmax(logits.reshape(B, K, -1), axis=-1)
    w = w.reshape(B, K, 2 * r + 1, 2 * r + 1)

    rx = jnp.sum(w * gx[..., None, :].astype(jnp.float32), axis=(-1, -2))
    ry = jnp.sum(w * gy[..., :, None].astype(jnp.float32), axis=(-1, -2))
    return jnp.stack([rx, ry], axis=-1)


def subpixel_refine(
    heatmaps: jnp.ndarray,
    alpha_logit: jnp.ndarray,
    beta: float = 1.0,
    radius: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Soft-argmax + local Gaussian refinement blended by sigmoid(alpha).

    SubPixelRefinement (/root/reference/models/fusion_head.py:131-172) with
    its learnable fusion alpha passed in as a logit.
    """
    g_coords, scores = soft_argmax(heatmaps, beta=beta)
    l_coords = local_gaussian_refine(heatmaps, g_coords, radius=radius)
    a = jax.nn.sigmoid(alpha_logit)
    return a * g_coords + (1.0 - a) * l_coords, scores


def sample_at_coords(maps: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear point-sample per-keypoint maps at sub-pixel coordinates.

    Equivalent of the reference's F.grid_sample(mode='bilinear',
    padding_mode='border', align_corners=True) call on coords normalized by
    2*x/(W-1)-1 (/root/reference/models/fusion_head.py:344-359): with
    align_corners=True that normalization round-trips to plain pixel
    coordinates, and border padding is a clamp.

    Args:
      maps: (B, H, W, K, C) per-keypoint fields (e.g. offsets, C=2).
      coords: (B, K, 2) pixel coordinates (x, y).
    Returns:
      (B, K, C) sampled values.
    """
    B, H, W, K, C = maps.shape
    x = jnp.clip(coords[..., 0], 0.0, W - 1.0)
    y = jnp.clip(coords[..., 1], 0.0, H - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)

    flat = maps.transpose(0, 3, 1, 2, 4).reshape(B, K, H * W, C)

    def tap(yi, xi):
        lin = yi * W + xi
        return jnp.take_along_axis(flat, lin[..., None, None], axis=2)[:, :, 0, :]

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x1i)
    v10 = tap(y1i, x0i)
    v11 = tap(y1i, x1i)
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy) +
            v10 * (1 - fx) * fy + v11 * fx * fy)


def fusion_decode(
    heatmaps: jnp.ndarray,
    offsets: jnp.ndarray,
    alpha_logit: jnp.ndarray,
    fusion_weight_logit: jnp.ndarray,
    beta: float = 1.0,
    radius: int = 2,
    apply_offset: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full fusion-head decode: sub-pixel refine + offset correction.

    HeatmapRegressionHead.decode (/root/reference/models/fusion_head.py:309-365):
    coords += sigmoid(fusion_weight) * offsets sampled at coords.

    Args:
      heatmaps: (B, H, W, K); offsets: (B, H, W, K, 2).
    """
    coords, scores = subpixel_refine(heatmaps, alpha_logit, beta=beta, radius=radius)
    if apply_offset:
        sampled = sample_at_coords(offsets, coords)
        coords = coords + jax.nn.sigmoid(fusion_weight_logit) * sampled
    return coords, scores


def fused_alpha_decode(
    heatmaps: jnp.ndarray,
    regression_coords: Optional[jnp.ndarray] = None,
    alpha: float = 0.5,
    image_size: float = 256.0,
    adaptive: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stack-B fused decode: Taylor heatmap coords alpha-blended with direct
    regression coords, then confidence-adaptive alpha.

    Equivalent of fused_decode (/root/reference/utils/postprocess.py:78-135).
    Heatmap coords are scaled to image space; regression coords (given
    normalized to [0,1]) likewise.  When ``adaptive``, the fixed-alpha blend
    is replaced by alpha = maxval / (maxval + 0.1) — exactly the reference's
    overwrite at :126-131.

    Returns coords in image space, (B, K, 2); maxvals (B, K).
    """
    B, H, W, K = heatmaps.shape
    hm_coords, maxvals = taylor_decode(heatmaps)
    hm_coords = hm_coords * jnp.asarray(
        [image_size / W, image_size / H], jnp.float32)

    if regression_coords is None:
        return hm_coords, maxvals

    reg = regression_coords * image_size
    if adaptive:
        a = (maxvals / (maxvals + 0.1))[..., None]
    else:
        a = alpha
    return a * hm_coords + (1.0 - a) * reg, maxvals


def window_centroid_refine(
    heatmaps: jnp.ndarray,
    coords: jnp.ndarray,
    window_size: int = 5,
) -> jnp.ndarray:
    """Local-window weighted-centroid refinement.

    Vectorized coordinate_refinement (/root/reference/utils/postprocess.py:138-184):
    weights are the raw (not softmaxed) heatmap values normalized by the
    window sum; the window is truncated at borders.
    """
    B, H, W, K = heatmaps.shape
    r = window_size // 2
    px = coords[..., 0].astype(jnp.int32)  # int() truncation like reference
    py = coords[..., 1].astype(jnp.int32)

    offs = jnp.arange(-r, r + 1)
    win_x = px[..., None] + offs[None, None, :]
    win_y = py[..., None] + offs[None, None, :]
    valid_x = (win_x >= 0) & (win_x < W)
    valid_y = (win_y >= 0) & (win_y < H)
    gx = jnp.clip(win_x, 0, W - 1)
    gy = jnp.clip(win_y, 0, H - 1)

    flat = heatmaps.transpose(0, 3, 1, 2).reshape(B, K, H * W)
    lin = gy[..., :, None] * W + gx[..., None, :]
    patches = jnp.take_along_axis(flat, lin.reshape(B, K, -1), axis=-1)
    patches = patches.reshape(B, K, window_size, window_size)
    valid = valid_y[..., :, None] & valid_x[..., None, :]
    patches = jnp.where(valid, patches, 0.0)

    denom = jnp.sum(patches, axis=(-1, -2), keepdims=True) + 1e-8
    w = patches / denom
    rx = jnp.sum(w * gx[..., None, :].astype(jnp.float32), axis=(-1, -2))
    ry = jnp.sum(w * gy[..., :, None].astype(jnp.float32), axis=(-1, -2))
    return jnp.stack([rx, ry], axis=-1)


def flip_heatmaps(heatmaps: jnp.ndarray, flip_index: jnp.ndarray,
                  shift: bool = False) -> jnp.ndarray:
    """Flip heatmaps horizontally and swap mirrored keypoint channels
    (/root/reference/models/pose_estimator.py:303-317).  ``shift`` applies
    the standard 1px SHIFT_HEATMAP correction for even-stride backbones."""
    out = heatmaps[:, :, ::-1, :][..., flip_index]
    if shift:
        out = jnp.concatenate([out[:, :, :1, :], out[:, :, :-1, :]], axis=2)
    return out


def transform_preds(coords: jnp.ndarray, centers: jnp.ndarray,
                    scales: jnp.ndarray, output_size) -> jnp.ndarray:
    """Back-project coords from crop space to original image coordinates.

    Vectorized transform_preds (/root/reference/validate.py:31-36):
      out = coord / output_size * scale + center - scale/2
    with coords (B, K, 2), centers/scales (B, 2), output_size (W, H).
    """
    osz = jnp.asarray(output_size, jnp.float32)
    return (coords / osz * scales[:, None, :] + centers[:, None, :]
            - scales[:, None, :] / 2.0)


def temporal_smooth(coords_seq: jnp.ndarray, window_size: int = 5,
                    method: str = "gaussian", fps: float = 30.0
                    ) -> jnp.ndarray:
    """Temporal trajectory smoothing over a (T, K, 2) sequence.

    'gaussian' / 'moving_average' are equivalents of temporal_smoothing
    (/root/reference/utils/postprocess.py:187-223) including the reference's
    one-sided Gaussian kernel (exp(-i^2/2sigma^2), i=0..w-1, sigma=w/3) and
    edge padding applied via np.convolve semantics.  'one_euro' is the
    standard real-time pose smoother (causal, lag-adaptive) exposed by the
    temporal config.
    """
    import numpy as np

    if method == "one_euro":
        return one_euro_smooth(coords_seq, fps=fps)

    T, K, D = coords_seq.shape
    if method == "gaussian":
        sig = window_size / 3.0
        kernel = np.exp(-np.arange(window_size) ** 2 / (2 * sig**2))
        kernel = kernel / kernel.sum()
    else:
        kernel = np.ones(window_size) / window_size
    kern = jnp.asarray(kernel, jnp.float32)
    half = window_size // 2

    traj = coords_seq.reshape(T, K * D).T  # (K*D, T)
    padded = jnp.pad(traj, ((0, 0), (half, half)), mode="edge")

    def conv1(row):
        return jnp.convolve(row, kern, mode="valid")

    sm = jax.vmap(conv1)(padded)  # (K*D, T)
    return sm.T.reshape(T, K, D)


def one_euro_smooth(coords_seq: jnp.ndarray, fps: float = 30.0,
                    min_cutoff: float = 1.0, beta: float = 0.007,
                    d_cutoff: float = 1.0) -> jnp.ndarray:
    """One-Euro filter over a (T, K, 2) trajectory (causal lax.scan).

    Adaptive exponential smoothing: the cutoff rises with speed, so slow
    jitter is damped while fast motion stays responsive — the standard
    choice for real-time pose streams.
    """
    dt = 1.0 / fps

    def alpha(cutoff):
        tau = 1.0 / (2.0 * jnp.pi * cutoff)
        return 1.0 / (1.0 + tau / dt)

    def step(carry, x):
        x_prev, dx_prev = carry
        dx = (x - x_prev) / dt
        a_d = alpha(d_cutoff)
        dx_hat = a_d * dx + (1 - a_d) * dx_prev
        cutoff = min_cutoff + beta * jnp.abs(dx_hat)
        a = alpha(cutoff)
        x_hat = a * x + (1 - a) * x_prev
        return (x_hat, dx_hat), x_hat

    x0 = coords_seq[0]
    (_, _), out = jax.lax.scan(
        step, (x0, jnp.zeros_like(x0)), coords_seq[1:])
    return jnp.concatenate([x0[None], out], axis=0)

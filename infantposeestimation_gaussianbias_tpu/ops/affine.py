"""Affine crop geometry + batched on-device image warping.

TPU-native replacement for the reference's cv2-based preprocessing
(`/root/reference/datasets/transforms.py:59-107` builds a 3-point
cv2.getAffineTransform; `cv2.warpAffine` applies it per sample on the host).
Here the matrix is built analytically (closed form of the same 3-point
construction) and the warp is a single batched bilinear gather that jit-compiles
for the whole batch — no host round-trip, no per-sample Python.

Conventions
-----------
* ``center``/``scale`` are (x, y) pixel units; ``scale`` is the padded source
  box (width, height) — only ``scale[0]`` enters the matrix, exactly like the
  reference (src_w = scale[0]).
* ``output_size`` is (width, height).
* Matrices are 2x3 forward maps  dst = M @ [src, 1].
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def get_affine_matrix(
    center: jnp.ndarray,
    scale: jnp.ndarray,
    output_size: Tuple[int, int],
    rot_deg: jnp.ndarray | float = 0.0,
) -> jnp.ndarray:
    """Forward 2x3 affine matrix mapping source-image -> output-crop pixels.

    Closed-form equivalent of the reference's 3-point construction
    (/root/reference/datasets/transforms.py:59-107): the crop is a
    rotation by ``rot_deg`` about ``center`` followed by uniform scaling
    ``dst_w / src_w`` and translation of ``center`` to the crop center.

    Supports batched ``center (..., 2)`` / ``scale (..., 2)`` / ``rot``.
    """
    center = jnp.asarray(center, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    rot = jnp.asarray(rot_deg, jnp.float32)

    src_w = scale[..., 0]
    dst_w = float(output_size[0])
    dst_h = float(output_size[1])

    theta = rot * (np.pi / 180.0)
    cs, sn = jnp.cos(theta), jnp.sin(theta)
    s = dst_w / src_w  # isotropic zoom

    # Solving the reference's three point-correspondences gives
    #   dst = s * R(-theta) @ (src - center) + [dst_w/2, dst_h/2]
    # with R the standard CCW rotation matrix.
    a = s * cs
    b = s * sn
    cx, cy = center[..., 0], center[..., 1]
    tx = dst_w * 0.5 - (a * cx + b * cy)
    ty = dst_h * 0.5 - (-b * cx + a * cy)
    row0 = jnp.stack([a, b, tx], axis=-1)
    row1 = jnp.stack([-b, a, ty], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def invert_affine(mat: jnp.ndarray) -> jnp.ndarray:
    """Invert a (..., 2, 3) affine matrix."""
    a, b, tx = mat[..., 0, 0], mat[..., 0, 1], mat[..., 0, 2]
    c, d, ty = mat[..., 1, 0], mat[..., 1, 1], mat[..., 1, 2]
    det = a * d - b * c
    ia, ib = d / det, -b / det
    ic, id_ = -c / det, a / det
    itx = -(ia * tx + ib * ty)
    ity = -(ic * tx + id_ * ty)
    row0 = jnp.stack([ia, ib, itx], axis=-1)
    row1 = jnp.stack([ic, id_, ity], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def transform_points(points: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
    """Apply a (..., 2, 3) affine matrix to (..., N, 2) points.

    Written as elementwise VPU math, not a matmul: on TPU a 2x3 matmul
    would route through the MXU at bfloat16 precision and lose ~0.5 px
    on image-sized coordinates.
    """
    x, y = points[..., 0], points[..., 1]
    m = mat[..., None, :, :]  # broadcast over points
    nx = m[..., 0, 0] * x + m[..., 0, 1] * y + m[..., 0, 2]
    ny = m[..., 1, 0] * x + m[..., 1, 1] * y + m[..., 1, 2]
    return jnp.stack([nx, ny], axis=-1)


def _warp_one(img: jnp.ndarray, inv_mat: jnp.ndarray,
              out_w: int, out_h: int) -> jnp.ndarray:
    """Bilinear warp of one (H, W, C) image given the dst->src matrix.

    Matches cv2.warpAffine(INTER_LINEAR, BORDER_CONSTANT=0): out-of-bounds
    source taps contribute zero.
    """
    H, W = img.shape[0], img.shape[1]
    dst_x = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    dst_y = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    src_x = inv_mat[0, 0] * dst_x + inv_mat[0, 1] * dst_y + inv_mat[0, 2]
    src_y = inv_mat[1, 0] * dst_x + inv_mat[1, 1] * dst_y + inv_mat[1, 2]

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    fx = src_x - x0
    fy = src_y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        valid = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H))
        xi_c = jnp.clip(xi, 0, W - 1)
        yi_c = jnp.clip(yi, 0, H - 1)
        vals = img[yi_c, xi_c]  # (out_h, out_w, C) gather
        return vals * valid[..., None].astype(img.dtype)

    w00 = ((1 - fx) * (1 - fy))[..., None]
    w01 = (fx * (1 - fy))[..., None]
    w10 = ((1 - fx) * fy)[..., None]
    w11 = (fx * fy)[..., None]
    out = (tap(y0i, x0i) * w00 + tap(y0i, x0i + 1) * w01 +
           tap(y0i + 1, x0i) * w10 + tap(y0i + 1, x0i + 1) * w11)
    return out


@partial(jax.jit, static_argnums=(2, 3))
def warp_affine_batch(imgs: jnp.ndarray, mats: jnp.ndarray,
                      out_w: int, out_h: int) -> jnp.ndarray:
    """Warp a batch of (B, H, W, C) images with per-sample FORWARD matrices.

    Equivalent to the reference's per-sample
    ``cv2.warpAffine(img, trans, (out_w, out_h), INTER_LINEAR)``
    (/root/reference/datasets/transforms.py:40-46) but batched and on device.

    General path (handles rotation) via gather — slow on TPU; prefer
    warp_affine_separable for axis-aligned crops.
    """
    inv = invert_affine(mats)
    return jax.vmap(lambda im, m: _warp_one(im, m, out_w, out_h))(imgs, inv)


def _axis_weights(inv_scale: jnp.ndarray, inv_offset: jnp.ndarray,
                  out_size: int, src_size: int) -> jnp.ndarray:
    """Per-sample bilinear resampling matrix (B, out, src): row i holds the
    two bilinear tap weights relu(1 - |src_coord(i) - j|).  Out-of-range
    taps get zero weight == cv2's BORDER_CONSTANT(0)."""
    dst = jnp.arange(out_size, dtype=jnp.float32)
    src = inv_scale[:, None] * dst[None, :] + inv_offset[:, None]  # (B, out)
    grid = jnp.arange(src_size, dtype=jnp.float32)
    return jax.nn.relu(1.0 - jnp.abs(src[:, :, None] - grid[None, None, :]))


@partial(jax.jit, static_argnums=(2, 3))
def warp_affine_separable(imgs: jnp.ndarray, mats: jnp.ndarray,
                          out_w: int, out_h: int) -> jnp.ndarray:
    """MXU-native bilinear warp for AXIS-ALIGNED affines (no rotation —
    scale/translate/flip), i.e. matrices whose linear part is diagonal.

    A bilinear resample along an axis is a sparse (2-taps-per-row) matrix;
    instead of gathering (catastrophically slow on TPU) the warp becomes two
    batched matmuls on the systolic array:
        out = W_y @ img @ W_x^T
    This is the fast path for the validation/inference pipeline, where the
    reference's crops are never rotated (rot=0 in
    /root/reference/datasets/transforms.py:318-322, inference.py:64-109).
    """
    B, H, W, C = imgs.shape
    inv = invert_affine(mats)
    wy = _axis_weights(inv[:, 1, 1], inv[:, 1, 2], out_h, H)  # (B,out_h,H)
    wx = _axis_weights(inv[:, 0, 0], inv[:, 0, 2], out_w, W)  # (B,out_w,W)
    dt = imgs.dtype if imgs.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    tmp = jnp.einsum("boh,bhwc->bowc", wy.astype(dt), imgs.astype(dt),
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("bpw,bowc->bopc", wx.astype(dt), tmp,
                     preferred_element_type=jnp.float32)
    return out


def _lerp_taps_along(x: jnp.ndarray, src: jnp.ndarray, axis: int,
                     size: int) -> jnp.ndarray:
    """2-tap bilinear resample of ``x`` along ``axis`` at positions ``src``
    (same shape as x minus channels), out-of-range taps contributing zero
    (cv2 BORDER_CONSTANT).  Uses take_along_axis: a single-axis gather,
    which XLA lowers far better on TPU than the joint 2-D gather."""
    i0 = jnp.floor(src)
    f = (src - i0)[..., None]
    i0 = i0.astype(jnp.int32)

    def tap(idx):
        valid = (idx >= 0) & (idx < size)
        idx_c = jnp.clip(idx, 0, size - 1)
        vals = jnp.take_along_axis(x, idx_c[..., None], axis=axis)
        return vals * valid[..., None].astype(x.dtype)

    return tap(i0) * (1.0 - f) + tap(i0 + 1) * f


# Max per-column vertical shear |ic/ia| (= |tan(rot)| for pure
# rotation+scale) the two-pass warp tolerates before its sheared
# bilinear footprint degrades; beyond it (|rot| > ~63 deg) samples take
# the exact joint-gather path.  Reference training rotation is a
# +-2*40 deg clipped gaussian (/root/reference/datasets/transforms.py:
# 154-195), so the tail past 63 deg does occur.
_TWOPASS_MAX_SHEAR = 2.0


@partial(jax.jit, static_argnums=(2, 3))
def warp_affine_twopass(imgs: jnp.ndarray, mats: jnp.ndarray,
                        out_w: int, out_h: int) -> jnp.ndarray:
    """General batched affine warp (rotation included) as TWO single-axis
    resample passes — the Catmull-Smith decomposition.

    The sample POSITIONS factor exactly: pass 1 resamples each column j
    vertically at  s*y + u*j + v  and pass 2 resamples horizontally at
    ia*x + ib*y + itx, which lands on the true source position
    (ic*x + id*y + ity vertically) at the continuous sample point:

        tmp[b, y, j] = lerp_y( imgs[b, :, j],  s*y + u*j + v )
        out[b, y, x] = lerp_x( tmp[b, y, :],   ia*x + ib*y + itx )

    with (for the dst->src inverse [[ia, ib, itx], [ic, id, ity]]):
        u = ic/ia,  s = id - ib*ic/ia,  v = ity - u*itx.

    The bilinear FOOTPRINT however is an approximation under rotation:
    pass 2's two column taps j0, j0+1 carry vertical positions differing
    by u = ic/ia, so the 4 effective taps form a sheared parallelogram
    rather than cv2's axis-aligned unit square.  Exact only when u == 0
    (rot = 0 / pure scale+flip); for smooth content at the reference's
    typical rotations (+-40 deg) the error is small (see
    test_warp_twopass_close_to_cv2_on_smooth_content), growing with
    |tan(rot)| and degenerate as |rot| -> 90 deg (ia -> 0, u -> inf).

    Samples whose shear exceeds ``_TWOPASS_MAX_SHEAR`` (|u| > 2, i.e.
    |rot| beyond ~63 deg, including the +-90 NaN zone) therefore fall
    back per-sample to the exact joint 4-tap ``warp_affine_batch`` path;
    the fallback branch only executes at runtime when such a sample is
    present (lax.cond).  Each pass is a 2-tap take_along_axis
    (single-axis gather) instead of the 4-tap joint 2-D gather — the
    rot!=0 fast path this framework uses for on-device training
    augmentation.  Approximates cv2.warpAffine(INTER_LINEAR,
    BORDER_CONSTANT=0) like the reference's host path
    (/root/reference/datasets/transforms.py:40-46).
    """
    B, H, W, C = imgs.shape
    inv = invert_affine(mats)
    ia, ib, itx = inv[:, 0, 0], inv[:, 0, 1], inv[:, 0, 2]
    ic, id_, ity = inv[:, 1, 0], inv[:, 1, 1], inv[:, 1, 2]

    u = ic / ia  # inf/nan at ia == 0 (|rot| = 90 deg); guarded below
    s = id_ - ib * ic / ia
    v = ity - u * itx

    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    js = jnp.arange(W, dtype=jnp.float32)

    # vertical pass at source width: rows (B, out_h, W)
    src_y = (s[:, None, None] * ys[None, :, None]
             + u[:, None, None] * js[None, None, :]
             + v[:, None, None])
    tmp = _lerp_taps_along(imgs, src_y, axis=1, size=H)

    # horizontal pass: cols (B, out_h, out_w)
    src_x = (ia[:, None, None] * xs[None, None, :]
             + ib[:, None, None] * ys[None, :, None]
             + itx[:, None, None])
    two_pass = _lerp_taps_along(tmp, src_x, axis=2, size=W)

    # Per-sample fallback for extreme rotations: ~(<=) also catches the
    # NaN/inf shear at ia == 0, where two_pass is garbage and jnp.where
    # must select the joint-gather result instead.
    bad = jnp.logical_not(jnp.abs(u) <= _TWOPASS_MAX_SHEAR)

    def _with_joint_fallback():
        joint = jax.vmap(lambda im, m: _warp_one(im, m, out_w, out_h))(
            imgs, inv)
        return jnp.where(bad[:, None, None, None], joint, two_pass)

    return jax.lax.cond(jnp.any(bad), _with_joint_fallback,
                        lambda: two_pass)


def crop_and_normalize(
    imgs: jnp.ndarray,
    centers: jnp.ndarray,
    scales: jnp.ndarray,
    output_size: Tuple[int, int],
    rots: jnp.ndarray | None = None,
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406),
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225),
) -> jnp.ndarray:
    """Fused crop + /255 + ImageNet normalize (NHWC float output).

    Mirrors /root/reference/inference.py:64-109 preprocessing, fully on
    device for a batch of crops.
    """
    out_w, out_h = int(output_size[0]), int(output_size[1])
    if rots is None:
        # No rotation: axis-aligned crop rides the MXU (two matmuls).
        mats = get_affine_matrix(centers, scales, output_size, 0.0)
        crops = warp_affine_separable(imgs.astype(jnp.float32), mats,
                                      out_w, out_h)
    else:
        # Rotated path: two single-axis resample passes (gathers along one
        # axis) instead of the joint 2-D gather.
        mats = get_affine_matrix(centers, scales, output_size, rots)
        crops = warp_affine_twopass(imgs.astype(jnp.float32), mats,
                                    out_w, out_h)
    mean_a = jnp.asarray(mean, jnp.float32) * 255.0
    std_a = jnp.asarray(std, jnp.float32) * 255.0
    return (crops - mean_a) / std_a

"""Parity tests: vectorized device ops vs loop-based numpy/cv2 oracles."""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from infantposeestimation_gaussianbias_tpu import ops
from tests import oracles


# ---------------------------------------------------------------------------
# Affine geometry
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("rot", [0.0, 17.5, -40.0, 80.0])
def test_affine_matrix_matches_cv2(rot, rng):
    center = rng.uniform(50, 400, 2).astype(np.float32)
    scale = np.array([rng.uniform(80, 300)] * 2, np.float32)
    out_size = (192, 256)
    ours = np.asarray(ops.get_affine_matrix(center, scale, out_size, rot))
    ref = oracles.get_affine_transform_oracle(center, scale, out_size, rot)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_affine_matrix_batched(rng):
    centers = rng.uniform(50, 400, (8, 2)).astype(np.float32)
    scales = np.repeat(rng.uniform(80, 300, (8, 1)), 2, 1).astype(np.float32)
    rots = rng.uniform(-80, 80, 8).astype(np.float32)
    mats = np.asarray(ops.get_affine_matrix(centers, scales, (192, 256), rots))
    for i in range(8):
        ref = oracles.get_affine_transform_oracle(
            centers[i], scales[i], (192, 256), rots[i])
        np.testing.assert_allclose(mats[i], ref, rtol=1e-4, atol=1e-3)


def test_invert_affine(rng):
    mats = np.asarray(ops.get_affine_matrix(
        rng.uniform(50, 400, (4, 2)).astype(np.float32),
        np.repeat(rng.uniform(80, 300, (4, 1)), 2, 1).astype(np.float32),
        (192, 256),
        rng.uniform(-40, 40, 4).astype(np.float32)))
    inv = np.asarray(ops.invert_affine(jnp.asarray(mats)))
    pts = rng.uniform(0, 200, (4, 5, 2)).astype(np.float32)
    fwd = np.asarray(ops.transform_points(jnp.asarray(pts), jnp.asarray(mats)))
    back = np.asarray(ops.transform_points(jnp.asarray(fwd), jnp.asarray(inv)))
    np.testing.assert_allclose(back, pts, rtol=1e-3, atol=1e-2)


@pytest.mark.parametrize("rot", [0.0, 25.0])
def test_warp_matches_cv2(rot, rng):
    img = rng.randint(0, 255, (240, 320, 3)).astype(np.float32)
    center = np.array([160.0, 120.0], np.float32)
    scale = np.array([200.0, 266.0], np.float32)
    out_w, out_h = 96, 128

    mat = np.asarray(ops.get_affine_matrix(center, scale, (out_w, out_h), rot))
    ref = cv2.warpAffine(img, mat.astype(np.float64), (out_w, out_h),
                         flags=cv2.INTER_LINEAR)
    ours = np.asarray(ops.warp_affine_batch(
        jnp.asarray(img)[None], jnp.asarray(mat)[None], out_w, out_h))[0]
    # cv2 uses fixed-point bilinear (5-bit fractions); allow ~1 intensity level.
    assert np.mean(np.abs(ours - ref)) < 0.5
    assert np.max(np.abs(ours - ref)) < 8.0


# ---------------------------------------------------------------------------
# Heatmap targets
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("sigma", [2.0, 1.5, 3.0])
def test_generate_targets_matches_oracle(sigma, rng):
    B, K = 4, 17
    input_size, heatmap_size = (192, 256), (48, 64)
    kpts = rng.uniform(-30, 230, (B, K, 2)).astype(np.float32)
    vis = rng.randint(0, 3, (B, K)).astype(np.float32)

    tgt, w = ops.generate_targets(jnp.asarray(kpts), jnp.asarray(vis),
                                  heatmap_size, input_size, sigma, "msra")
    tgt = np.asarray(tgt)  # (B, H, W, K)
    w = np.asarray(w)
    for b in range(B):
        ref_t, ref_w = oracles.generate_target_oracle(
            kpts[b], vis[b], heatmap_size, input_size, sigma)
        np.testing.assert_allclose(tgt[b].transpose(2, 0, 1), ref_t,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(w[b], ref_w)


def test_generate_targets_peak_location(rng):
    """The Gaussian peak must land on the (integer-truncated) keypoint."""
    kpts = np.array([[[100.0, 120.0]]], np.float32)  # -> heatmap (25, 30)
    vis = np.ones((1, 1), np.float32)
    tgt, w = ops.generate_targets(jnp.asarray(kpts), jnp.asarray(vis),
                                  (48, 64), (192, 256), 2.0)
    tgt = np.asarray(tgt)[0, :, :, 0]
    py, px = np.unravel_index(tgt.argmax(), tgt.shape)
    assert (px, py) == (25, 30)
    assert tgt.max() == pytest.approx(1.0)
    assert np.asarray(w)[0, 0] == 1.0


def test_generate_targets_exact_mode(rng):
    kpts = np.array([[[101.3, 121.7]]], np.float32)
    vis = np.ones((1, 1), np.float32)
    tgt, w = ops.generate_targets(jnp.asarray(kpts), jnp.asarray(vis),
                                  (48, 64), (192, 256), 2.0, "exact")
    tgt = np.asarray(tgt)[0, :, :, 0]
    # Peak at the rounded sub-pixel center
    py, px = np.unravel_index(tgt.argmax(), tgt.shape)
    assert (px, py) == (round(101.3 / 4), round(121.7 / 4))


# ---------------------------------------------------------------------------
# Decoding
# ---------------------------------------------------------------------------

def _random_heatmaps(rng, B=3, K=17, H=64, W=48, peaked=True):
    hm = rng.uniform(0, 0.1, (B, K, H, W)).astype(np.float32)
    if peaked:
        for b in range(B):
            for k in range(K):
                y, x = rng.randint(2, H - 2), rng.randint(2, W - 2)
                yy, xx = np.mgrid[0:H, 0:W]
                hm[b, k] += np.exp(-((xx - x) ** 2 + (yy - y) ** 2) / 8.0)
    return hm


def test_argmax_decode(rng):
    hm = _random_heatmaps(rng)
    coords, vals = ops.argmax_decode(jnp.asarray(hm.transpose(0, 2, 3, 1)))
    flat = hm.reshape(hm.shape[0], hm.shape[1], -1)
    idx = flat.argmax(-1)
    np.testing.assert_allclose(np.asarray(vals), flat.max(-1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(coords)[..., 0], idx % 48)
    np.testing.assert_allclose(np.asarray(coords)[..., 1], idx // 48)


def test_quarter_shift_decode(rng):
    hm = _random_heatmaps(rng)
    coords, vals = ops.quarter_shift_decode(jnp.asarray(hm.transpose(0, 2, 3, 1)))
    ref_c, ref_v = oracles.quarter_shift_oracle(hm)
    np.testing.assert_allclose(np.asarray(coords), ref_c, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vals), ref_v, rtol=1e-6)


def test_taylor_decode(rng):
    hm = _random_heatmaps(rng)
    coords, vals = ops.taylor_decode(jnp.asarray(hm.transpose(0, 2, 3, 1)))
    ref_c, ref_v = oracles.taylor_oracle(hm)
    np.testing.assert_allclose(np.asarray(coords), ref_c, atol=1e-4)
    np.testing.assert_allclose(np.asarray(vals), ref_v, rtol=1e-6)


def test_soft_argmax(rng):
    hm = _random_heatmaps(rng)
    coords, scores = ops.soft_argmax(jnp.asarray(hm.transpose(0, 2, 3, 1)),
                                     beta=1.0)
    ref_c, ref_s = oracles.soft_argmax_oracle(hm)
    np.testing.assert_allclose(np.asarray(coords), ref_c, atol=1e-3)
    np.testing.assert_allclose(np.asarray(scores), ref_s, rtol=1e-5)


def test_local_gaussian_refine(rng):
    hm = _random_heatmaps(rng)
    coarse = rng.uniform(-1, 49, (3, 17, 2)).astype(np.float32)
    out = ops.local_gaussian_refine(jnp.asarray(hm.transpose(0, 2, 3, 1)),
                                    jnp.asarray(coarse), radius=2)
    ref = oracles.local_refine_oracle(hm, coarse, r=2)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_sample_at_coords(rng):
    B, K, H, W, C = 2, 17, 64, 48, 2
    maps = rng.randn(B, K, C, H, W).astype(np.float32)
    coords = rng.uniform(-2, 50, (B, K, 2)).astype(np.float32)
    maps_nhwkc = maps.transpose(0, 3, 4, 1, 2)  # (B, H, W, K, C)
    out = ops.sample_at_coords(jnp.asarray(maps_nhwkc), jnp.asarray(coords))
    ref = oracles.grid_sample_point_oracle(maps, coords)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_decode_roundtrip_subpixel():
    """encode keypoint -> heatmap -> taylor decode must recover the keypoint
    to sub-pixel accuracy (the reference's core property)."""
    rng = np.random.RandomState(1)
    kpts = rng.uniform(40, 150, (8, 17, 2)).astype(np.float32)
    vis = np.ones((8, 17), np.float32)
    tgt, _ = ops.generate_targets(jnp.asarray(kpts), jnp.asarray(vis),
                                  (48, 64), (192, 256), 2.0, "exact")
    coords, _ = ops.taylor_decode(tgt)
    err = np.abs(np.asarray(coords) - kpts / 4.0)
    assert err.max() < 0.3, f"max sub-pixel error {err.max()}"


def test_flip_heatmaps():
    from infantposeestimation_gaussianbias_tpu.schemas import COCO17
    rng = np.random.RandomState(2)
    hm = rng.randn(2, 64, 48, 17).astype(np.float32)
    flip_idx = jnp.asarray(COCO17.flip_index())
    out = np.asarray(ops.flip_heatmaps(jnp.asarray(hm), flip_idx))
    # left_eye (1) channel of output = right_eye (2) channel mirrored
    np.testing.assert_allclose(out[:, :, :, 1], hm[:, :, ::-1, 2])
    np.testing.assert_allclose(out[:, :, :, 0], hm[:, :, ::-1, 0])
    # double flip = identity
    out2 = np.asarray(ops.flip_heatmaps(jnp.asarray(out), flip_idx))
    np.testing.assert_allclose(out2, hm)


def test_transform_preds(rng):
    coords = rng.uniform(0, 192, (4, 17, 2)).astype(np.float32)
    centers = rng.uniform(100, 300, (4, 2)).astype(np.float32)
    scales = rng.uniform(100, 400, (4, 2)).astype(np.float32)
    out = np.asarray(ops.transform_preds(
        jnp.asarray(coords), jnp.asarray(centers), jnp.asarray(scales),
        (192, 256)))
    for b in range(4):
        for k in range(17):
            ref_x = coords[b, k, 0] / 192 * scales[b, 0] + centers[b, 0] - scales[b, 0] / 2
            ref_y = coords[b, k, 1] / 256 * scales[b, 1] + centers[b, 1] - scales[b, 1] / 2
            np.testing.assert_allclose(out[b, k], [ref_x, ref_y], rtol=1e-5)


def test_temporal_smooth_matches_reference_kernel():
    rng = np.random.RandomState(3)
    seq = rng.randn(20, 13, 2).astype(np.float32)
    out = np.asarray(ops.temporal_smooth(jnp.asarray(seq), 5, "gaussian"))
    # Reference protocol: one-sided gaussian kernel + edge pad + np.convolve
    sig = 5 / 3.0
    kernel = np.exp(-np.arange(5) ** 2 / (2 * sig**2))
    kernel /= kernel.sum()
    for k in range(13):
        for d in range(2):
            padded = np.pad(seq[:, k, d], (2, 2), mode="edge")
            ref = np.convolve(padded, kernel, mode="valid")
            np.testing.assert_allclose(out[:, k, d], ref, atol=1e-5)


def test_fused_alpha_decode(rng):
    hm = _random_heatmaps(rng, B=2, K=13, H=64, W=64)
    reg = rng.uniform(0, 1, (2, 13, 2)).astype(np.float32)
    coords, vals = ops.fused_alpha_decode(
        jnp.asarray(hm.transpose(0, 2, 3, 1)), jnp.asarray(reg),
        alpha=0.5, image_size=256.0, adaptive=True)
    ref_hm_c, ref_v = oracles.taylor_oracle(hm)
    ref_hm_c = ref_hm_c * (256.0 / 64)
    a = (ref_v / (ref_v + 0.1))[..., None]
    ref = a * ref_hm_c + (1 - a) * reg * 256.0
    np.testing.assert_allclose(np.asarray(coords), ref, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("flip", [False, True])
def test_warp_separable_matches_cv2(flip, rng):
    """Axis-aligned (rot=0, optional flip) separable warp vs cv2."""
    from infantposeestimation_gaussianbias_tpu.data.transforms import (
        affine_matrix_np,
        compose_flip,
    )
    img = rng.randint(0, 255, (240, 320, 3)).astype(np.float32)
    center = np.array([170.0, 110.0], np.float32)
    scale = np.array([210.0, 280.0], np.float32)
    out_w, out_h = 96, 128
    mat = affine_matrix_np(center, scale, (out_w, out_h), 0.0)
    if flip:
        mat = compose_flip(mat, img.shape[1])
    ref = cv2.warpAffine(img, mat.astype(np.float64), (out_w, out_h),
                         flags=cv2.INTER_LINEAR)
    ours = np.asarray(ops.affine.warp_affine_separable(
        jnp.asarray(img)[None], jnp.asarray(mat)[None], out_w, out_h))[0]
    assert np.mean(np.abs(ours - ref)) < 0.5
    assert np.max(np.abs(ours - ref)) < 8.0


def test_one_euro_smooth():
    from infantposeestimation_gaussianbias_tpu.ops.decode import (
        one_euro_smooth,
        temporal_smooth,
    )

    rng = np.random.RandomState(0)
    t = np.linspace(0, 4 * np.pi, 120)
    clean = np.zeros((120, 3, 2), np.float32)
    clean[:, 0, 0] = 50 + 20 * np.sin(t)
    noisy = clean + rng.randn(120, 3, 2).astype(np.float32) * 2.0

    sm = np.asarray(one_euro_smooth(jnp.asarray(noisy), fps=30.0))
    assert sm.shape == noisy.shape
    # first sample passes through unchanged (causal filter)
    np.testing.assert_allclose(sm[0], noisy[0])
    # smoother output: residual vs clean shrinks
    err_raw = np.abs(noisy - clean).mean()
    err_sm = np.abs(sm - clean).mean()
    assert err_sm < err_raw * 0.8

    # dispatch through temporal_smooth
    sm2 = np.asarray(temporal_smooth(jnp.asarray(noisy), method="one_euro"))
    np.testing.assert_allclose(sm2, sm)


def test_streaming_smoother_matches_batch_one_euro():
    """The stateful per-frame smoother must reproduce the offline
    one-euro filter when fed the trajectory frame by frame, and resume
    cleanly after reset()."""
    from infantposeestimation_gaussianbias_tpu.ops.decode import (
        one_euro_smooth,
    )
    from infantposeestimation_gaussianbias_tpu.postprocess import (
        StreamingSmoother,
    )

    rng = np.random.RandomState(1)
    traj = rng.uniform(0, 64, (60, 17, 2)).astype(np.float32)
    ref = np.asarray(one_euro_smooth(jnp.asarray(traj), fps=30.0))

    smoother = StreamingSmoother(fps=30.0)
    out = np.stack([smoother(frame) for frame in traj])
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)

    smoother.reset()
    out2 = np.stack([smoother(frame) for frame in traj])
    np.testing.assert_allclose(out2, out)


def _twopass_oracle(img, inv, out_w, out_h):
    """Loop-based numpy oracle of the exact two-pass resampling math."""
    H, W, C = img.shape
    ia, ib, itx = inv[0]
    ic, id_, ity = inv[1]
    u = ic / ia
    s = id_ - ib * ic / ia
    v = ity - u * itx

    def lerp_rows(col, pos):
        r0 = int(np.floor(pos))
        f = pos - r0
        def tap(r):
            return img[r, col] if 0 <= r < H else np.zeros(C, img.dtype)
        return tap(r0) * (1 - f) + tap(r0 + 1) * f

    tmp = np.zeros((out_h, W, C), np.float32)
    for y in range(out_h):
        for j in range(W):
            tmp[y, j] = lerp_rows(j, s * y + u * j + v)

    out = np.zeros((out_h, out_w, C), np.float32)
    for y in range(out_h):
        for x in range(out_w):
            cx = ia * x + ib * y + itx
            c0 = int(np.floor(cx))
            f = cx - c0
            def tap(c):
                return tmp[y, c] if 0 <= c < W else np.zeros(C, np.float32)
            out[y, x] = tap(c0) * (1 - f) + tap(c0 + 1) * f
    return out


@pytest.mark.parametrize("rot", [-31.0, 18.0])
def test_warp_twopass_matches_loop_oracle(rot, rng):
    """The vectorized two-pass warp == the loop-based two-pass math."""
    img = rng.randint(0, 255, (60, 80, 3)).astype(np.float32)
    center = np.array([40.0, 30.0], np.float32)
    scale = np.array([55.0, 73.0], np.float32)
    mat = np.asarray(ops.get_affine_matrix(center, scale, (24, 32), rot))
    inv = np.asarray(ops.invert_affine(jnp.asarray(mat)))
    ref = _twopass_oracle(img, inv, 24, 32)
    ours = np.asarray(ops.warp_affine_twopass(
        jnp.asarray(img)[None], jnp.asarray(mat)[None], 24, 32))[0]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-2)


@pytest.mark.parametrize("rot", [-40.0, 0.0, 25.0])
def test_warp_twopass_close_to_cv2_on_smooth_content(rot, rng):
    """Two-pass resampling differs from one-shot bilinear by O(h * grad)
    within a pixel, so on smooth (natural-image-like) content it tracks
    cv2.warpAffine closely; at rot=0 it is exactly bilinear."""
    low = rng.randint(0, 255, (30, 40, 3)).astype(np.float32)
    img = cv2.resize(low, (320, 240), interpolation=cv2.INTER_CUBIC)
    center = np.array([150.0, 130.0], np.float32)
    scale = np.array([210.0, 280.0], np.float32)
    out_w, out_h = 96, 128

    mat = np.asarray(ops.get_affine_matrix(center, scale, (out_w, out_h), rot))
    ref = cv2.warpAffine(img, mat.astype(np.float64), (out_w, out_h),
                         flags=cv2.INTER_LINEAR)
    ours = np.asarray(ops.warp_affine_twopass(
        jnp.asarray(img)[None], jnp.asarray(mat)[None], out_w, out_h))[0]
    # compare where every bilinear tap is strictly in bounds (the border
    # zero-taps blend in a different order between one-shot and two-pass)
    inv = np.asarray(ops.invert_affine(jnp.asarray(mat)))
    yy, xx = np.mgrid[0:out_h, 0:out_w].astype(np.float32)
    sx = inv[0, 0] * xx + inv[0, 1] * yy + inv[0, 2]
    sy = inv[1, 0] * xx + inv[1, 1] * yy + inv[1, 2]
    inb = ((sx >= 2) & (sx < img.shape[1] - 3) &
           (sy >= 2) & (sy < img.shape[0] - 3))[..., None]
    diff = np.abs(ours - ref) * inb
    tol = (0.5, 8.0) if rot == 0.0 else (1.5, 25.0)
    assert diff.sum() / (inb.sum() * 3) < tol[0]
    assert diff.max() < tol[1]


def test_warp_twopass_geometry_is_exact(rng):
    """Sampling geometry (not just filtering) must match the one-shot
    warp exactly: a linear-ramp image is invariant under both filters, so
    any geometric error would show up as a value error."""
    H, W = 120, 160
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.stack([xx, yy, xx + yy], -1)  # linear ramps
    centers = rng.uniform(50, 110, (4, 2)).astype(np.float32)
    scales = np.repeat(rng.uniform(60, 100, (4, 1)), 2, 1).astype(np.float32)
    rots = rng.uniform(-40, 40, (4,)).astype(np.float32)
    mats = ops.get_affine_matrix(jnp.asarray(centers), jnp.asarray(scales),
                                 (48, 64), jnp.asarray(rots))
    imgs = jnp.asarray(np.repeat(img[None], 4, 0))
    a = np.asarray(ops.warp_affine_batch(imgs, mats, 48, 64))
    b = np.asarray(ops.warp_affine_twopass(imgs, mats, 48, 64))
    # identical wherever all taps are in-bounds (border zero-taps blend in
    # a different order) — mask from the true sampling geometry
    inv = np.asarray(ops.invert_affine(mats))
    yy, xx = np.mgrid[0:64, 0:48].astype(np.float32)
    sx = (inv[:, None, None, 0, 0] * xx + inv[:, None, None, 0, 1] * yy
          + inv[:, None, None, 0, 2])
    sy = (inv[:, None, None, 1, 0] * xx + inv[:, None, None, 1, 1] * yy
          + inv[:, None, None, 1, 2])
    inb = ((sx >= 2) & (sx < W - 3) & (sy >= 2) & (sy < H - 3))[..., None]
    assert inb.sum() > 1000  # the mask keeps a meaningful region
    diff = np.abs(a - b) * inb
    assert diff.max() < 1e-2

def test_warp_twopass_extreme_rotation_falls_back_to_joint(rng):
    """Rotations past the shear threshold (|tan rot| > 2, incl. the
    +-90 deg ia=0 NaN zone) must select the exact joint-gather result
    per sample, leaving in-threshold samples on the two-pass path."""
    img = rng.randint(0, 255, (60, 80, 3)).astype(np.float32)
    imgs = jnp.asarray(np.repeat(img[None], 4, 0))
    centers = jnp.asarray(np.tile([40.0, 30.0], (4, 1)).astype(np.float32))
    scales = jnp.asarray(np.tile([55.0, 73.0], (4, 1)).astype(np.float32))
    rots = jnp.asarray(np.array([90.0, -75.0, 20.0, -89.9], np.float32))
    mats = ops.get_affine_matrix(centers, scales, (24, 32), rots)
    out = np.asarray(ops.warp_affine_twopass(imgs, mats, 24, 32))
    joint = np.asarray(ops.warp_affine_batch(imgs, mats, 24, 32))
    assert np.isfinite(out).all()
    # extreme-rotation samples == the exact joint warp
    for i in (0, 1, 3):
        np.testing.assert_allclose(out[i], joint[i], rtol=1e-4, atol=1e-2)
    # the moderate sample stayed on the (approximate) two-pass path
    tp = np.asarray(ops.warp_affine_twopass(
        imgs[2:3], mats[2:3], 24, 32))[0]
    np.testing.assert_allclose(out[2], tp, rtol=1e-5, atol=1e-3)

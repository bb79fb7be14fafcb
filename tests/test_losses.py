"""Loss parity tests vs loop-based numpy oracles of the reference math."""

import math

import numpy as np
import jax.numpy as jnp

from infantposeestimation_gaussianbias_tpu import losses
from infantposeestimation_gaussianbias_tpu.schemas import COCO17
from tests import oracles


def _smooth_l1(x, y):
    d = np.abs(x - y)
    return np.where(d < 1.0, 0.5 * d * d, d - 0.5)


def _rand(rng, *shape):
    return rng.randn(*shape).astype(np.float32)


def test_heatmap_mse_weighted(rng):
    B, K, H, W = 3, 17, 16, 12
    pred = _rand(rng, B, K, H, W)
    tgt = _rand(rng, B, K, H, W)
    w = rng.randint(0, 3, (B, K)).astype(np.float32)
    ours = losses.heatmap_mse(jnp.asarray(pred.transpose(0, 2, 3, 1)),
                              jnp.asarray(tgt.transpose(0, 2, 3, 1)),
                              jnp.asarray(w))
    per = ((pred - tgt) ** 2).mean((2, 3))
    ref = (per * w).sum() / (w.sum() + 1e-8)
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5)


def test_keypoint_mse_loss(rng):
    B, K, H, W = 3, 17, 16, 12
    pred = _rand(rng, B, K, H, W)
    tgt = _rand(rng, B, K, H, W)
    w = rng.randint(0, 3, (B, K)).astype(np.float32)
    ours = losses.keypoint_mse_loss(jnp.asarray(pred.transpose(0, 2, 3, 1)),
                                    jnp.asarray(tgt.transpose(0, 2, 3, 1)),
                                    jnp.asarray(w))
    ref = np.mean((pred * w[..., None, None] - tgt * w[..., None, None]) ** 2)
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5)


def test_variance_alignment(rng):
    B, K, H, W = 2, 17, 16, 12
    hm = _rand(rng, B, K, H, W)
    coords = rng.uniform(0, 10, (B, K, 2)).astype(np.float32)
    w = np.ones((B, K), np.float32)
    var_branch = np.abs(_rand(rng, B, K, H, W))

    ours = losses.variance_alignment_loss(
        jnp.asarray(hm.transpose(0, 2, 3, 1)), jnp.asarray(coords),
        jnp.asarray(w), jnp.asarray(var_branch.transpose(0, 2, 3, 1)), 2.0)

    # oracle
    pos = np.maximum(hm, 0)
    norm = pos / (pos.sum((2, 3), keepdims=True) + 1e-8)
    gx, gy = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    vx = (norm * (gx - coords[:, :, 0, None, None]) ** 2).sum((2, 3))
    vy = (norm * (gy - coords[:, :, 1, None, None]) ** 2).sum((2, 3))
    sig = np.sqrt(vx + vy + 1e-8)
    per = (sig - 2.0) ** 2 + (var_branch.mean((2, 3)) - 2.0) ** 2
    ref = (per * w).sum() / (w.sum() + 1e-8)
    np.testing.assert_allclose(float(ours), ref, rtol=1e-4)


def test_spatial_overlap(rng):
    B, K, H, W = 2, 17, 16, 12
    hm = _rand(rng, B, K, H, W)
    w = rng.randint(0, 2, (B, K)).astype(np.float32)
    skeleton = COCO17.skeleton_array()

    ours = losses.spatial_overlap_loss(
        jnp.asarray(hm.transpose(0, 2, 3, 1)), jnp.asarray(w),
        jnp.asarray(skeleton), 0.5)

    prob = 1 / (1 + np.exp(-hm))
    total, count = 0.0, 0.0
    for (i, j) in skeleton:
        hi, hj = prob[:, i], prob[:, j]
        ov = np.minimum(hi, hj).sum((1, 2))
        ratio = ov / (np.minimum(hi.sum((1, 2)), hj.sum((1, 2))) + 1e-8)
        pen = np.maximum(ratio - 0.5, 0)
        vis = w[:, i] * w[:, j]
        total += (pen * vis).sum()
        count += vis.sum()
    ref = total / (count + 1e-8)
    np.testing.assert_allclose(float(ours), ref, rtol=1e-4)


def test_shape_loss(rng):
    B, K, H, W = 2, 17, 16, 12
    hm = _rand(rng, B, K, H, W)
    w = np.ones((B, K), np.float32)
    ours = losses.distribution_shape_loss(
        jnp.asarray(hm.transpose(0, 2, 3, 1)), jnp.asarray(w), 2.0)
    p = oracles.softmax(hm.reshape(B, K, -1), -1)
    ent = -(p * np.log(p + 1e-8)).sum(-1)
    tgt = math.log(2 * math.pi * math.e * 4.0)
    ref = ((ent - tgt) ** 2 * w).sum() / (w.sum() + 1e-8)
    np.testing.assert_allclose(float(ours), ref, rtol=1e-4)


def test_fusion_pose_loss_total(rng):
    """End-to-end six-term loss against a fully-composed oracle."""
    B, K, H, W = 2, 17, 16, 12
    hm = _rand(rng, B, K, H, W)
    offsets = _rand(rng, B, K, 2, H, W)
    variances = np.abs(_rand(rng, B, K, H, W))
    target = np.abs(_rand(rng, B, K, H, W))
    weight = rng.randint(0, 3, (B, K)).astype(np.float32)
    gt = rng.uniform(0, 190, (B, K, 2)).astype(np.float32)
    input_size = (48, 64)  # heatmap 12x16 => stride 4

    outputs = {
        "heatmaps": jnp.asarray(hm.transpose(0, 2, 3, 1)),
        "offsets": jnp.asarray(offsets.transpose(0, 3, 4, 1, 2)),
        "variances": jnp.asarray(variances.transpose(0, 2, 3, 1)),
    }
    out = losses.fusion_pose_loss(
        outputs, jnp.asarray(target.transpose(0, 2, 3, 1)),
        jnp.asarray(weight), jnp.asarray(gt),
        jnp.asarray(COCO17.skeleton_array()), input_size=input_size)

    # --- oracle ---
    coords, _ = oracles.soft_argmax_oracle(hm, 1.0)
    scale = np.array([W / input_size[0], H / input_size[1]], np.float32)
    gt_hm = gt * scale

    per_hm = ((hm - target) ** 2).mean((2, 3))
    l_hm = (per_hm * weight).sum() / (weight.sum() + 1e-8)

    sampled = oracles.grid_sample_point_oracle(offsets, coords)
    per_off = _smooth_l1(sampled, gt_hm - coords).mean(-1)
    l_off = (per_off * weight).sum() / (weight.sum() + 1e-8)

    per_peak = ((coords - gt_hm) ** 2).sum(-1)
    l_peak = (per_peak * weight).sum() / (weight.sum() + 1e-8)

    np.testing.assert_allclose(float(out["heatmap_loss"]), l_hm, rtol=1e-4)
    np.testing.assert_allclose(float(out["offset_loss"]), l_off, rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(float(out["peak_loss"]), 0.5 * l_peak,
                               rtol=1e-3)
    total = sum(float(out[k]) for k in
                ["heatmap_loss", "offset_loss", "peak_loss", "variance_loss",
                 "overlap_loss", "shape_loss"])
    np.testing.assert_allclose(float(out["total_loss"]), total, rtol=1e-5)


def test_morphology_shape_loss(rng):
    B, K, H, W = 2, 13, 16, 16
    pred = np.abs(_rand(rng, B, K, H, W))
    tgt = np.abs(_rand(rng, B, K, H, W))
    w = rng.randint(0, 2, (B, K)).astype(np.float32)
    ours = losses.morphology_shape_loss(
        jnp.asarray(pred.transpose(0, 2, 3, 1)),
        jnp.asarray(tgt.transpose(0, 2, 3, 1)), jnp.asarray(w), 1.0, 0.5)

    def stats(h):
        flat = h.reshape(B, K, -1)
        prob = flat / (flat.sum(-1, keepdims=True) + 1e-8)
        prob = prob.reshape(B, K, H, W)
        gx, gy = np.meshgrid(np.arange(W, dtype=np.float32),
                             np.arange(H, dtype=np.float32))
        mx = (prob * gx).sum((2, 3))
        my = (prob * gy).sum((2, 3))
        vx = (prob * (gx - mx[..., None, None]) ** 2).sum((2, 3))
        vy = (prob * (gy - my[..., None, None]) ** 2).sum((2, 3))
        return np.stack([mx, my], -1), np.stack([vx, vy], -1)

    pm, pv = stats(pred)
    tm, tv = stats(tgt)
    per = 1.0 * (pv - tv) ** 2 + 0.5 * (pm - tm) ** 2
    ref = (per * w[..., None]).mean()
    np.testing.assert_allclose(float(ours), ref, rtol=1e-4)


def test_joints_mse_loss(rng):
    B, K, H, W = 2, 13, 8, 8
    pred = _rand(rng, B, K, H, W)
    tgt = _rand(rng, B, K, H, W)
    w = rng.randint(0, 2, (B, K)).astype(np.float32)
    ours = losses.joints_mse_loss(jnp.asarray(pred.transpose(0, 2, 3, 1)),
                                  jnp.asarray(tgt.transpose(0, 2, 3, 1)),
                                  jnp.asarray(w))
    tot = 0.0
    for k in range(K):
        p = pred[:, k].reshape(B, -1) * w[:, k:k + 1]
        t = tgt[:, k].reshape(B, -1) * w[:, k:k + 1]
        tot += 0.5 * np.mean((p - t) ** 2)
    np.testing.assert_allclose(float(ours), tot / K, rtol=1e-5)


def test_combined_loss(rng):
    B, K, H, W = 2, 13, 16, 16
    preds = {
        "heatmaps": jnp.asarray(np.abs(_rand(rng, B, H, W, K))),
        "coords": jnp.asarray(rng.uniform(0, 1, (B, K, 2)).astype(np.float32)),
        "refined_coords": jnp.asarray(
            rng.uniform(0, 1, (B, K, 2)).astype(np.float32)),
    }
    tgts = {
        "heatmaps": jnp.asarray(np.abs(_rand(rng, B, H, W, K))),
        "coords": jnp.asarray(rng.uniform(0, 1, (B, K, 2)).astype(np.float32)),
        "weights": jnp.asarray(np.ones((B, K), np.float32)),
    }
    total, parts = losses.combined_loss(preds, tgts, morph_weight=0.1,
                                        reg_weight=0.5)
    expect = (float(parts["heatmap"]) + 0.1 * float(parts["morph"]) +
              0.5 * float(parts["regression"]) + 0.5 * float(parts["refined"]))
    np.testing.assert_allclose(float(total), expect, rtol=1e-5)
    assert float(total) > 0

"""The six-term Gaussian-constraint fusion loss — one pure function.

Rebuild of FusionPoseLoss + GaussianDistributionConstraint
(/root/reference/models/fusion_head.py:372-806) with identical math:

  L = w1*L_heatmap (weighted MSE)
    + w2*L_offset  (SmoothL1 at peak-sampled offsets vs GT - soft-argmax)
    + w3*L_peak    (squared L2 of soft-argmax coords vs GT)
    + w4*L_variance (2nd-moment sigma + variance-branch mean vs target sigma)
    + w5*L_overlap (skeleton-edge sigmoid-overlap hinge)
    + w6*L_shape   (softmax entropy vs analytic Gaussian entropy)

All math runs in float32 (the reference trains under fp16 autocast, which
keeps reductions in fp32; on TPU the model computes in bf16 and this loss
promotes to f32).  Everything is vectorized — the reference's skeleton-edge
loop becomes a gather over the edge table.

Layouts: heatmaps/variances (B, H, W, K); offsets (B, H, W, K, 2);
weights (B, K); gt_keypoints (B, K, 2) in input-image pixels.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops import decode as decode_ops


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray,
              beta: float = 1.0) -> jnp.ndarray:
    """Elementwise SmoothL1 (torch default beta=1)."""
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def _weighted_mean(per_kpt: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """sum(loss * w) / (sum(w) + 1e-8) over all (B, K)."""
    return jnp.sum(per_kpt * weight) / (jnp.sum(weight) + 1e-8)


def heatmap_mse(pred: jnp.ndarray, target: jnp.ndarray,
                weight: jnp.ndarray, use_weight: bool = True) -> jnp.ndarray:
    """Per-keypoint spatial-mean MSE, visibility-weighted
    (ref fusion_head.py:637-657)."""
    per = jnp.mean((pred.astype(jnp.float32) - target) ** 2, axis=(1, 2))  # (B,K)
    if use_weight:
        return _weighted_mean(per, weight)
    return jnp.mean(per)


def heatmap_variance(heatmaps: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sigma from the 2nd moment of the ReLU-normalized heatmap about coords
    (ref fusion_head.py:405-448). Returns (B, K)."""
    B, H, W, K = heatmaps.shape
    pos = jax.nn.relu(heatmaps.astype(jnp.float32))
    norm = pos / (jnp.sum(pos, axis=(1, 2), keepdims=True) + 1e-8)
    gx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)[None, :, :, None]
    gy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)[None, :, :, None]
    mx = coords[..., 0][:, None, None, :]
    my = coords[..., 1][:, None, None, :]
    var_x = jnp.sum(norm * (gx - mx) ** 2, axis=(1, 2))
    var_y = jnp.sum(norm * (gy - my) ** 2, axis=(1, 2))
    return jnp.sqrt(var_x + var_y + 1e-8)


def variance_alignment_loss(heatmaps, coords, weight, variances,
                            target_sigma: float) -> jnp.ndarray:
    """(sigma_heatmap - sigma_t)^2 + (mean variance branch - sigma_t)^2,
    weighted (ref fusion_head.py:452-482)."""
    sig = heatmap_variance(heatmaps, coords)
    per = (sig - target_sigma) ** 2
    if variances is not None:
        sig_pred = jnp.mean(variances.astype(jnp.float32), axis=(1, 2))  # (B,K)
        per = per + (sig_pred - target_sigma) ** 2
    return _weighted_mean(per, weight)


def spatial_overlap_loss(heatmaps, weight, skeleton: jnp.ndarray,
                         threshold: float = 0.5) -> jnp.ndarray:
    """Per-edge min(sigmoid hi, sigmoid hj) overlap-ratio hinge
    (ref fusion_head.py:484-527), vectorized over the edge table."""
    prob = jax.nn.sigmoid(heatmaps.astype(jnp.float32))  # (B,H,W,K)
    hi = prob[..., skeleton[:, 0]]  # (B,H,W,E)
    hj = prob[..., skeleton[:, 1]]
    overlap = jnp.sum(jnp.minimum(hi, hj), axis=(1, 2))  # (B,E)
    si = jnp.sum(hi, axis=(1, 2))
    sj = jnp.sum(hj, axis=(1, 2))
    ratio = overlap / (jnp.minimum(si, sj) + 1e-8)
    penalty = jax.nn.relu(ratio - threshold)
    vis = weight[:, skeleton[:, 0]] * weight[:, skeleton[:, 1]]  # (B,E)
    return jnp.sum(penalty * vis) / (jnp.sum(vis) + 1e-8)


def distribution_shape_loss(heatmaps, weight, target_sigma: float) -> jnp.ndarray:
    """Softmax-entropy match to the analytic 2D Gaussian entropy
    log(2*pi*e*sigma^2) (ref fusion_head.py:529-559)."""
    B, H, W, K = heatmaps.shape
    logits = heatmaps.astype(jnp.float32).reshape(B, H * W, K)
    probs = jax.nn.softmax(logits, axis=1)
    entropy = -jnp.sum(probs * jnp.log(probs + 1e-8), axis=1)  # (B,K)
    target = math.log(2 * math.pi * math.e * target_sigma**2)
    return _weighted_mean((entropy - target) ** 2, weight)


def fusion_pose_loss(
    outputs: Dict[str, jnp.ndarray],
    target_heatmaps: jnp.ndarray,
    target_weight: jnp.ndarray,
    gt_keypoints: jnp.ndarray,
    skeleton: jnp.ndarray,
    input_size: Tuple[int, int] = (192, 256),
    weights: Tuple[float, ...] = (1.0, 1.0, 0.5, 0.1, 0.05, 0.05),
    target_sigma: float = 2.0,
    use_target_weight: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Full six-term loss (ref fusion_head.py:745-806).

    Returns a dict with each weighted term plus 'total_loss'.  The offset
    target is GT (scaled to heatmap space) minus the CURRENT soft-argmax
    coords — the reference's exact (self-referential) contract at :687.
    """
    heatmaps = outputs["heatmaps"]
    offsets = outputs["offsets"]
    variances = outputs.get("variances")
    B, H, W, K = heatmaps.shape
    w1, w2, w3, w4, w5, w6 = weights
    wt = target_weight.astype(jnp.float32)

    pred_coords, _ = decode_ops.soft_argmax(heatmaps, beta=1.0)

    scale = jnp.asarray([W / input_size[0], H / input_size[1]], jnp.float32)
    gt_hm = gt_keypoints.astype(jnp.float32) * scale  # (B,K,2) heatmap space

    # 2. offset: SmoothL1(sampled offset, GT - pred), mean over xy.
    sampled = decode_ops.sample_at_coords(offsets, pred_coords)  # (B,K,2)
    off_per = jnp.mean(smooth_l1(sampled, gt_hm - pred_coords), axis=-1)
    # 3. peak: squared L2.
    peak_per = jnp.sum((pred_coords - gt_hm) ** 2, axis=-1)

    if use_target_weight:
        l_off = _weighted_mean(off_per, wt)
        l_peak = _weighted_mean(peak_per, wt)
    else:
        l_off = jnp.mean(off_per)
        l_peak = jnp.mean(peak_per)

    losses = {
        "heatmap_loss": w1 * heatmap_mse(heatmaps, target_heatmaps, wt,
                                         use_target_weight),
        "offset_loss": w2 * l_off,
        "peak_loss": w3 * l_peak,
        "variance_loss": w4 * variance_alignment_loss(
            heatmaps, pred_coords, wt, variances, target_sigma),
        "overlap_loss": w5 * spatial_overlap_loss(heatmaps, wt, skeleton),
        "shape_loss": w6 * distribution_shape_loss(heatmaps, wt, target_sigma),
    }
    losses["total_loss"] = sum(losses.values())
    return losses

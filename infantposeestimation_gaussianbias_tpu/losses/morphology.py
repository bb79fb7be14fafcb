"""Stack-B losses: morphology shape constraint + combined infant loss.

Pure-function rebuild of /root/reference/models/losses.py:10-290:

* weighted heatmap MSE / SmoothL1       (FusedPoseLoss :10-47)
* morphology shape loss — the paper's key innovation: MSE between the
  spatial variance (and mean) of the normalized predicted and GT heatmap
  distributions                          (MorphologyShapeLoss :50-135)
* coordinate regression SmoothL1        (OffsetRegressionLoss :138-168)
* classic per-joint 0.5*MSE             (JointsMSELoss :171-200)
* combined = 1.0*hm + w_morph*morph + w_reg*(reg + refined)
                                        (CombinedLoss :203-284)

Layouts: heatmaps (B, H, W, K); weights (B, K); coords (B, K, 2)
normalized to [0, 1] (the Stack-B dataset convention).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from .fusion import smooth_l1


def fused_pose_loss(pred, target, weight=None, loss_type: str = "mse"
                    ) -> jnp.ndarray:
    """Per-pixel MSE/SmoothL1, visibility-broadcast, mean over everything."""
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    per = (p - t) ** 2 if loss_type == "mse" else smooth_l1(p, t)
    if weight is not None:
        per = per * weight[:, None, None, :]
    return jnp.mean(per)


def spatial_statistics(heatmaps: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Spatial mean and variance of sum-normalized heatmaps.

    Returns mean (B, K, 2) and variance (B, K, 2), each (x, y)
    (ref models/losses.py:71-104)."""
    B, H, W, K = heatmaps.shape
    h = heatmaps.astype(jnp.float32)
    denom = jnp.sum(h, axis=(1, 2), keepdims=True) + 1e-8
    prob = h / denom
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :, None]
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None, None]
    mean_x = jnp.sum(prob * xs, axis=(1, 2))
    mean_y = jnp.sum(prob * ys, axis=(1, 2))
    var_x = jnp.sum(prob * (xs - mean_x[:, None, None, :]) ** 2, axis=(1, 2))
    var_y = jnp.sum(prob * (ys - mean_y[:, None, None, :]) ** 2, axis=(1, 2))
    return (jnp.stack([mean_x, mean_y], -1), jnp.stack([var_x, var_y], -1))


def morphology_shape_loss(pred, target, weight=None,
                          lambda_variance: float = 1.0,
                          lambda_mean: float = 0.5) -> jnp.ndarray:
    """L = mean(lambda_var*(Var(P)-Var(GT))^2 + lambda_mean*(Mu(P)-Mu(GT))^2),
    visibility-weighted (ref models/losses.py:106-135)."""
    p_mean, p_var = spatial_statistics(pred)
    t_mean, t_var = spatial_statistics(target)
    per = (lambda_variance * (p_var - t_var) ** 2 +
           lambda_mean * (p_mean - t_mean) ** 2)  # (B, K, 2)
    if weight is not None:
        per = per * weight[:, :, None]
    return jnp.mean(per)


def offset_regression_loss(pred_coords, target_coords, weight=None,
                           loss_type: str = "smoothl1") -> jnp.ndarray:
    """SmoothL1/L1/MSE on (B, K, 2) coords (ref models/losses.py:138-168)."""
    p = pred_coords.astype(jnp.float32)
    t = target_coords.astype(jnp.float32)
    if loss_type == "smoothl1":
        per = smooth_l1(p, t)
    elif loss_type == "l1":
        per = jnp.abs(p - t)
    else:
        per = (p - t) ** 2
    if weight is not None:
        per = per * weight[:, :, None]
    return jnp.mean(per)


def joints_mse_loss(pred, target, weight, use_target_weight: bool = True
                    ) -> jnp.ndarray:
    """Classic per-joint 0.5*MSE on weight-multiplied flattened heatmaps
    (ref models/losses.py:171-200)."""
    B, H, W, K = pred.shape
    p = pred.astype(jnp.float32).reshape(B, H * W, K)
    t = target.astype(jnp.float32).reshape(B, H * W, K)
    if use_target_weight:
        p = p * weight[:, None, :]
        t = t * weight[:, None, :]
    per_joint = 0.5 * jnp.mean((p - t) ** 2, axis=(0, 1))  # (K,)
    return jnp.mean(per_joint)


def combined_loss(
    predictions: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    morph_weight: float = 0.1,
    morph_lambda: float = 1.0,
    morph_mean_lambda: float = 0.5,
    reg_weight: float = 0.5,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Combined Stack-B training loss (ref models/losses.py:203-284).

    predictions: heatmaps (B,H,W,K) [+ coords, refined_coords (B,K,2)]
    targets: heatmaps, weights (B,K) [+ coords (B,K,2) normalized]
    """
    weight = targets.get("weights")
    losses: Dict[str, jnp.ndarray] = {}
    losses["heatmap"] = fused_pose_loss(predictions["heatmaps"],
                                        targets["heatmaps"], weight)
    losses["morph"] = morphology_shape_loss(
        predictions["heatmaps"], targets["heatmaps"], weight,
        lambda_variance=morph_lambda, lambda_mean=morph_mean_lambda)
    total = losses["heatmap"] + morph_weight * losses["morph"]
    if "coords" in predictions and "coords" in targets:
        losses["regression"] = offset_regression_loss(
            predictions["coords"], targets["coords"], weight)
        total = total + reg_weight * losses["regression"]
    if "refined_coords" in predictions and "coords" in targets:
        losses["refined"] = offset_regression_loss(
            predictions["refined_coords"], targets["coords"], weight)
        total = total + reg_weight * losses["refined"]
    losses["total"] = total
    return total, losses

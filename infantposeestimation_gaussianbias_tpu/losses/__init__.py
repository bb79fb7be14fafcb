"""Loss functions: six-term fusion loss, morphology losses, heatmap MSE."""

from .fusion import (
    distribution_shape_loss,
    fusion_pose_loss,
    heatmap_mse,
    heatmap_variance,
    smooth_l1,
    spatial_overlap_loss,
    variance_alignment_loss,
)
from .morphology import (
    combined_loss,
    fused_pose_loss,
    joints_mse_loss,
    morphology_shape_loss,
    offset_regression_loss,
    spatial_statistics,
)


def keypoint_mse_loss(pred, target, weight=None, use_target_weight=True):
    """Weight-multiplied mean MSE (ref models/pose_estimator.py:102-143):
    mean((pred*w - target*w)^2) over all elements.

    pred/target: (B, H, W, K); weight: (B, K)."""
    import jax.numpy as jnp

    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    if use_target_weight and weight is not None:
        w = weight[:, None, None, :]
        p = p * w
        t = t * w
    return jnp.mean((p - t) ** 2)


__all__ = [
    "combined_loss",
    "distribution_shape_loss",
    "fused_pose_loss",
    "fusion_pose_loss",
    "heatmap_mse",
    "heatmap_variance",
    "joints_mse_loss",
    "keypoint_mse_loss",
    "morphology_shape_loss",
    "offset_regression_loss",
    "smooth_l1",
    "spatial_overlap_loss",
    "spatial_statistics",
    "variance_alignment_loss",
]

"""Stack-B post-processing toolbox: filtering, pose NMS, full pipeline.

Rebuild of the remaining pieces of /root/reference/utils/postprocess.py
(decode primitives live in ops/decode.py): confidence filtering (:226-238),
greedy per-pose keypoint NMS (:241-267), and the end-to-end
postprocess_predictions pipeline (:296-336).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .ops import decode as decode_ops


def filter_low_confidence(preds: jnp.ndarray, maxvals: jnp.ndarray,
                          threshold: float = 0.3
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Zero coordinates with confidence <= threshold
    (ref utils/postprocess.py:226-238). preds (B,K,2); maxvals (B,K)."""
    mask = (maxvals > threshold).astype(jnp.float32)
    return preds * mask[..., None], mask


class StreamingSmoother:
    """Stateful per-frame One-Euro smoother for LIVE pose streams.

    The batch smoothers (ops/decode.py temporal_smooth, matching the
    reference's offline utils/postprocess.py:187-223) need the whole
    trajectory; a live stream gets one frame at a time.  This carries
    the filter state across calls and reproduces
    ops/decode.one_euro_smooth exactly when fed a trajectory frame by
    frame (tested).  Host-side numpy: K x 2 math per frame is far below
    dispatch cost.

    >>> smoother = StreamingSmoother(fps=30.0)
    >>> for coords, scores in infer.predict_stream(loader):
    ...     smoothed = smoother(coords[0])
    """

    def __init__(self, fps: float = 30.0, min_cutoff: float = 1.0,
                 beta: float = 0.007, d_cutoff: float = 1.0):
        import numpy as np

        self._np = np
        self.dt = 1.0 / fps
        self.min_cutoff = min_cutoff
        self.beta = beta
        self.d_cutoff = d_cutoff
        self._x = None
        self._dx = None

    def _alpha(self, cutoff):
        tau = 1.0 / (2.0 * self._np.pi * cutoff)
        return 1.0 / (1.0 + tau / self.dt)

    def __call__(self, coords):
        """One frame (K, 2) in, smoothed (K, 2) out (float32 numpy)."""
        np = self._np
        x = np.asarray(coords, np.float32)
        if self._x is None:
            self._x = x
            self._dx = np.zeros_like(x)
            return x
        dx = (x - self._x) / self.dt
        a_d = self._alpha(self.d_cutoff)
        dx_hat = a_d * dx + (1 - a_d) * self._dx
        cutoff = self.min_cutoff + self.beta * np.abs(dx_hat)
        a = self._alpha(cutoff)
        x_hat = a * x + (1 - a) * self._x
        self._x, self._dx = x_hat, dx_hat
        return x_hat

    def reset(self) -> None:
        self._x = self._dx = None


def nms_pose(preds: jnp.ndarray, maxvals: jnp.ndarray,
             distance_threshold: float = 5.0
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy within-pose keypoint NMS (ref utils/postprocess.py:241-267):
    scanning keypoints in order, a still-kept keypoint suppresses every
    other keypoint within the distance threshold except the most confident
    of that neighborhood.  Vectorized over the batch; the greedy scan over
    K (<=17) keypoints is a fori_loop.
    """
    B, K, _ = preds.shape

    def per_sample(pts, conf):
        d = jnp.sqrt(jnp.sum(
            (pts[:, None, :] - pts[None, :, :]) ** 2, -1))  # (K, K)

        def body(k, keep):
            nearby = d[k] < distance_threshold  # includes k itself
            masked_conf = jnp.where(nearby, conf, -jnp.inf)
            best = jnp.argmax(masked_conf)
            new_keep = jnp.where(nearby & (jnp.arange(K) != best),
                                 False, keep)
            # only apply when keypoint k is itself still kept
            return jnp.where(keep[k], new_keep, keep)

        keep = jax.lax.fori_loop(0, K, body, jnp.ones(K, bool))
        return keep

    keep = jax.vmap(per_sample)(preds, maxvals)  # (B, K)
    return preds * keep[..., None].astype(preds.dtype), keep


def postprocess_predictions(
    outputs: Dict[str, jnp.ndarray],
    batch_meta: Dict[str, jnp.ndarray],
    fusion_alpha: float = 0.5,
    conf_threshold: float = 0.3,
    image_size: float = 256.0,
    refine_window: int = 5,
) -> Dict[str, jnp.ndarray]:
    """Full Stack-B pipeline (ref utils/postprocess.py:296-336):
    fused alpha-decode -> window-centroid refinement -> confidence filter
    -> back-projection to original image coordinates.

    Unlike the reference (which refines AFTER scaling to image space —
    mixing coordinate frames), refinement here runs in heatmap space
    before scaling; the rest of the contract is identical.

    outputs: heatmaps (B, H, W, K) [+ coords (B, K, 2) normalized].
    batch_meta: center (B, 2), scale (B, 2) [optional].
    """
    heatmaps = outputs["heatmaps"]
    B, H, W, K = heatmaps.shape
    reg = outputs.get("coords")

    hm_coords, maxvals = decode_ops.taylor_decode(heatmaps)
    hm_coords = decode_ops.window_centroid_refine(heatmaps, hm_coords,
                                                  refine_window)
    scale_to_img = jnp.asarray([image_size / W, image_size / H], jnp.float32)
    preds = hm_coords * scale_to_img
    if reg is not None:
        a = (maxvals / (maxvals + 0.1))[..., None]  # adaptive alpha
        preds = a * preds + (1.0 - a) * reg * image_size

    preds, mask = filter_low_confidence(preds, maxvals, conf_threshold)

    if "center" in batch_meta and "scale" in batch_meta:
        preds = decode_ops.transform_preds(
            preds, batch_meta["center"], batch_meta["scale"],
            (image_size, image_size))

    return {"preds": preds, "maxvals": maxvals, "mask": mask}

"""Prediction heads: plain heatmap, 3-branch fusion, Stack-B fused, SimCC.

Capability-parity rebuilds of:
* HeatmapHead                 /root/reference/models/pose_estimator.py:22-99
* HeatmapRegressionHead       /root/reference/models/fusion_head.py:179-307
* FusedHeadModule + refine    /root/reference/models/pose_hrnet.py:135-214
* SimCCHead                   /root/reference/analysis/hrnet_improvements.py:145-224

All outputs are NHWC: heatmaps (B, H, W, K), offsets (B, H, W, K, 2),
variances (B, H, W, K).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvNorm, make_norm

# std=0.001 normal init for final prediction convs, the standard pose
# convention used by the reference (/root/reference/models/pose_estimator.py:81-88).
final_init = nn.initializers.normal(stddev=0.001)


class HeatmapHead(nn.Module):
    """Optional SimpleBaseline-style deconv stack + 1x1 prediction conv."""

    num_keypoints: int
    num_deconv_layers: int = 0
    deconv_filters: Tuple[int, ...] = (256, 256, 256)
    deconv_kernels: Tuple[int, ...] = (4, 4, 4)
    norm: str = "batchnorm"
    dtype: Any = jnp.float32
    quant: bool = False
    calibrate: bool = False
    fold: bool = False  # accepted for interface symmetry; no ConvNorms here

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        if self.quant:
            # int8 backbones hand over a QTensor; the head itself stays in
            # the compute dtype (cheap final convs, precision-sensitive).
            x = x.dequantize(self.dtype)
        for i in range(self.num_deconv_layers):
            k = self.deconv_kernels[i]
            x = nn.ConvTranspose(self.deconv_filters[i], (k, k),
                                 strides=(2, 2), padding="SAME",
                                 use_bias=False, kernel_init=final_init,
                                 dtype=self.dtype, name=f"deconv{i}")(x)
            x = make_norm(self.norm, name=f"deconv{i}_norm")(x, train)
            x = nn.relu(x)
        heatmaps = nn.Conv(self.num_keypoints, (1, 1), kernel_init=final_init,
                           dtype=self.dtype, name="final")(x)
        return {"heatmaps": heatmaps.astype(jnp.float32)}


class FusionHead(nn.Module):
    """Shared trunk + heatmap / offset / variance branches + learnable
    decode parameters (sub-pixel alpha, offset fusion weight).

    Structure mirrors /root/reference/models/fusion_head.py:195-307:
    trunk = 2 x (3x3 conv-norm-relu, hidden); heatmap and offset branches
    each (3x3 conv-norm-relu, hidden) -> 1x1; variance branch uses
    hidden/2 channels and softplus.
    """

    num_keypoints: int
    hidden_dim: int = 256
    norm: str = "batchnorm"
    dtype: Any = jnp.float32
    quant: bool = False
    calibrate: bool = False
    fold: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        h = self.hidden_dim
        K = self.num_keypoints
        kw = dict(norm=self.norm, dtype=self.dtype, quant=self.quant,
                  calibrate=self.calibrate, fold=self.fold)

        def deq(t):
            # int8 mode: branch ConvNorms emit QTensors; the 1x1 finals
            # run in the compute dtype on the dequantized activations
            # (cheap and precision-sensitive — decode reads them).
            return t.dequantize(self.dtype) if self.quant else t

        for i in range(2):
            x = ConvNorm(h, 3, name=f"shared{i}", **kw)(x, train)

        hm = ConvNorm(h, 3, name="hm_conv", **kw)(x, train)
        heatmaps = nn.Conv(K, (1, 1), kernel_init=final_init,
                           dtype=self.dtype, name="hm_final")(deq(hm))

        off = ConvNorm(h, 3, name="off_conv", **kw)(x, train)
        offsets = nn.Conv(K * 2, (1, 1), kernel_init=final_init,
                          dtype=self.dtype, name="off_final")(deq(off))
        B, H, W, _ = offsets.shape
        offsets = offsets.reshape(B, H, W, K, 2)

        var = ConvNorm(h // 2, 3, name="var_conv", **kw)(x, train)
        variances = nn.Conv(K, (1, 1), kernel_init=final_init,
                            dtype=self.dtype, name="var_final")(deq(var))
        variances = jax.nn.softplus(variances.astype(jnp.float32))

        # Learnable scalars, stored as raw logits; the reference stores
        # them pre-sigmoid at 0.5 (fusion_head.py:143,265).
        fusion_w = self.param("fusion_weight", nn.initializers.constant(0.5), ())
        alpha = self.param("subpixel_alpha", nn.initializers.constant(0.5), ())

        return {
            "heatmaps": heatmaps.astype(jnp.float32),
            "offsets": offsets.astype(jnp.float32),
            "variances": variances,
            "fusion_weight_logit": fusion_w,
            "subpixel_alpha_logit": alpha,
        }


class FusedHead(nn.Module):
    """Stack-B fused head: 1x1 heatmap conv + global-pool regression MLP
    + offset-refinement of the regression coords
    (/root/reference/models/pose_hrnet.py:135-214).

    Regression coords are normalized [0, 1]; refined = coords + 0.1 * mean
    spatial offset, exactly the reference's simplification.
    """

    num_keypoints: int
    norm: str = "batchnorm"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        K = self.num_keypoints
        C = x.shape[-1]
        heatmaps = nn.Conv(K, (1, 1), kernel_init=final_init,
                           dtype=self.dtype, name="hm")(x)

        r = ConvNorm(max(C // 2, 8), 3, norm=self.norm, dtype=self.dtype,
                     name="reg_conv")(x, train)
        r = jnp.mean(r, axis=(1, 2))  # global average pool
        coords = nn.Dense(K * 2, dtype=self.dtype, name="reg_fc")(r)
        coords = coords.reshape(-1, K, 2).astype(jnp.float32)

        comb = jnp.concatenate([x, heatmaps], axis=-1)
        o = ConvNorm(C, 3, norm=self.norm, dtype=self.dtype,
                     name="refine_conv")(comb, train)
        offsets = nn.Conv(K * 2, (1, 1), kernel_init=final_init,
                          dtype=self.dtype, name="refine_final")(o)
        mean_off = jnp.mean(offsets, axis=(1, 2)).reshape(-1, K, 2)
        refined = coords + 0.1 * mean_off.astype(jnp.float32)

        return {
            "heatmaps": heatmaps.astype(jnp.float32),
            "coords": coords,
            "refined_coords": refined,
        }


class SimCCHead(nn.Module):
    """SimCC head: per-keypoint 1-D classification over x and y bins
    (/root/reference/analysis/hrnet_improvements.py:145-224).

    Decoding = softmax expectation over each axis, giving sub-pixel coords
    directly in input space / split_ratio.
    """

    num_keypoints: int
    input_size: Tuple[int, int]  # (W, H)
    split_ratio: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        K = self.num_keypoints
        W_bins = int(self.input_size[0] * self.split_ratio)
        H_bins = int(self.input_size[1] * self.split_ratio)

        feats = nn.Conv(K, (1, 1), kernel_init=final_init,
                        dtype=self.dtype, name="kpt_conv")(x)
        B, H, W, _ = feats.shape
        flat = feats.transpose(0, 3, 1, 2).reshape(B, K, H * W)
        simcc_x = nn.Dense(W_bins, dtype=self.dtype, name="fc_x")(flat)
        simcc_y = nn.Dense(H_bins, dtype=self.dtype, name="fc_y")(flat)
        return {
            "simcc_x": simcc_x.astype(jnp.float32),
            "simcc_y": simcc_y.astype(jnp.float32),
        }

    @staticmethod
    def decode(simcc_x: jnp.ndarray, simcc_y: jnp.ndarray,
               split_ratio: float = 2.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
        px = jax.nn.softmax(simcc_x, axis=-1)
        py = jax.nn.softmax(simcc_y, axis=-1)
        xs = jnp.sum(px * jnp.arange(px.shape[-1], dtype=jnp.float32), -1)
        ys = jnp.sum(py * jnp.arange(py.shape[-1], dtype=jnp.float32), -1)
        coords = jnp.stack([xs, ys], -1) / split_ratio
        scores = jnp.minimum(jnp.max(px, -1), jnp.max(py, -1))
        return coords, scores

"""Shared flax building blocks: conv-norm units, residual blocks, resize.

TPU-native counterparts of the reference's torch blocks
(/root/reference/models/hrnet.py:12-103): NHWC layouts, configurable
compute dtype (bfloat16 on TPU with float32 params and float32 norm
statistics), and a norm switch (BatchNorm for reference parity — under
GSPMD data parallelism batch statistics are global automatically —
or GroupNorm for sync-free scaling).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import quant as quant_ops
from ..ops.quant import QTensor

# kaiming-normal fan_out, matching the reference init
# (/root/reference/models/hrnet.py:389-396).
conv_kernel_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

_absmax_init = lambda: jnp.zeros((), jnp.float32)


def sow_absmax(module: nn.Module, name: str, x: jnp.ndarray) -> None:
    """Record the running abs-max of ``x`` for PTQ calibration
    (ops/quant.py); no-op unless the 'calib' collection is mutable."""
    module.sow("calib", name, jnp.max(jnp.abs(x)).astype(jnp.float32),
               init_fn=_absmax_init, reduce_fn=jnp.maximum)


class ConvNorm(nn.Module):
    """Conv -> Norm (-> optional ReLU), bias-free conv like the reference.

    ``quant`` switches to the int8 serving path (ops/quant.py): the input
    is a QTensor, the conv runs int8 x int8 -> int32 on the MXU, and the
    dequant + folded-BN affine + ReLU + (optional) requant epilogue is one
    XLA fusion.  ``calibrate`` makes the float path sow the output abs-max
    used to derive the requant scale.
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    use_relu: bool = True
    norm: str = "batchnorm"
    dtype: Any = jnp.float32
    quant: bool = False
    quant_out: bool = True   # requantize the output to int8
    calibrate: bool = False
    # fold: float serving with inference-BN baked into the conv weights +
    # bias (models/fold.py) — removes the separate BN op whose layout/
    # fusion overhead dominates the stem (BENCH.md stem probe: 1.8 ms
    # without BN vs 18 ms with, b256).
    fold: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.fold:
            x = nn.Conv(
                self.features,
                (self.kernel_size, self.kernel_size),
                strides=(self.strides, self.strides),
                padding=self.kernel_size // 2,
                use_bias=True,
                kernel_init=conv_kernel_init,
                dtype=self.dtype,
                name="conv",
            )(x)
            return nn.relu(x) if self.use_relu else x
        if self.quant:
            return self._quant_call(x)
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=self.kernel_size // 2,
            use_bias=False,
            kernel_init=conv_kernel_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = make_norm(self.norm, name="norm")(x, train)
        if self.use_relu:
            x = nn.relu(x)
        if self.calibrate:
            sow_absmax(self, "out_absmax", x)
        return x

    def _quant_call(self, x: QTensor):
        q = {k: self.variable("qparams", k).value
             for k in ("w_int8", "eff_scale", "eff_bias")}
        p = self.kernel_size // 2
        y = quant_ops.qconv_affine(
            x, q, strides=(self.strides, self.strides),
            padding=((p, p), (p, p)))
        if self.use_relu:
            y = jnp.maximum(y, 0.0)
        if self.quant_out:
            return quant_ops.requantize(
                y, self.variable("qparams", "out_scale").value)
        return y


class QDense(nn.Module):
    """int8 serving twin of nn.Dense: reads the qparams emitted by
    ops.quant.convert_dense at this module's path (same name as the float
    Dense it replaces, so the trees line up) and runs the int8 matmul +
    f32 epilogue.  Input is float; output f32."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        q = {k: self.variable("qparams", k).value
             for k in ("w_int8", "w_scale", "bias", "in_scale")}
        return quant_ops.qdense(x, q)


class BatchNorm(nn.Module):
    """BatchNorm with f32 statistics and compute-dtype inference affine.

    torch BatchNorm2d semantics (eps=1e-5, running-stat update
    ra = 0.9*ra + 0.1*batch).  Training computes batch statistics in f32
    over the (global, under GSPMD) batch.  Inference folds (scale, bias,
    mean, var) into a single per-channel (a, b) — computed in f32 but
    applied in the activation dtype, so on a bf16 model no f32 activation
    tensor ever hits HBM (the dominant backbone bandwidth cost).
    """

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(C, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(C, jnp.float32))

        if train:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value +
                                 (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value +
                                (1 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value

        a = scale * jax.lax.rsqrt(var + self.epsilon)
        b = bias - mean * a
        return (x * a.astype(x.dtype) + b.astype(x.dtype)).astype(x.dtype) \
            if not train else \
            ((x.astype(jnp.float32) * a + b)).astype(x.dtype)


class Norm(nn.Module):
    """Norm selector: custom BatchNorm (reference parity) or GroupNorm."""

    kind: str = "batchnorm"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.kind == "batchnorm":
            return BatchNorm(name="bn")(x, train)
        if self.kind == "groupnorm":
            groups = min(32, x.shape[-1])
            while x.shape[-1] % groups:
                groups -= 1
            orig = x.dtype
            y = nn.GroupNorm(num_groups=groups, epsilon=1e-5,
                             dtype=jnp.float32,
                             name="gn")(x.astype(jnp.float32))
            return y.astype(orig)
        raise ValueError(f"Unknown norm {self.kind!r}")


def make_norm(kind: str, name: str) -> Norm:
    return Norm(kind=kind, name=name)


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity residual (ref models/hrnet.py:12-53).

    int8 mode: conv1 emits int8, conv2 emits f32 (its epilogue), the
    dequantized residual joins in the same fusion, and the block output
    is requantized with its own calibrated scale.
    """

    features: int
    norm: str = "batchnorm"
    dtype: Any = jnp.float32
    quant: bool = False
    calibrate: bool = False
    fold: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(norm=self.norm, dtype=self.dtype, quant=self.quant,
                  calibrate=self.calibrate, fold=self.fold)
        y = ConvNorm(self.features, 3, name="conv1", **kw)(x, train)
        y = ConvNorm(self.features, 3, use_relu=False, name="conv2",
                     quant_out=False, **kw)(y, train)
        if self.quant:
            out = jnp.maximum(y + x.dequantize(jnp.float32), 0.0)
            return quant_ops.requantize(
                out, self.variable("qparams", "out_scale").value)
        out = nn.relu(y + x)
        if self.calibrate:
            sow_absmax(self, "out_absmax", out)
        return out


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1(x4) bottleneck residual (ref models/hrnet.py:56-103).

    ``downsample`` (1x1 conv+norm on the skip) is created automatically when
    input channels differ from features * 4.
    """

    features: int
    expansion: int = 4
    norm: str = "batchnorm"
    dtype: Any = jnp.float32
    quant: bool = False
    calibrate: bool = False
    fold: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.features * self.expansion
        kw = dict(norm=self.norm, dtype=self.dtype, quant=self.quant,
                  calibrate=self.calibrate, fold=self.fold)
        in_ch = x.shape[-1]
        if in_ch != out_ch:
            residual = ConvNorm(out_ch, 1, use_relu=False, quant_out=False,
                                name="downsample", **kw)(x, train)
        else:
            residual = x.dequantize(jnp.float32) if self.quant else x
        y = ConvNorm(self.features, 1, name="conv1", **kw)(x, train)
        y = ConvNorm(self.features, 3, name="conv2", **kw)(y, train)
        y = ConvNorm(out_ch, 1, use_relu=False, quant_out=False,
                     name="conv3", **kw)(y, train)
        if self.quant:
            out = jnp.maximum(y + residual, 0.0)
            return quant_ops.requantize(
                out, self.variable("qparams", "out_scale").value)
        out = nn.relu(y + residual)
        if self.calibrate:
            sow_absmax(self, "out_absmax", out)
        return out


def _resize_weights(out_size: int, in_size: int) -> jnp.ndarray:
    """(out, in) bilinear resampling matrix, half-pixel convention with
    edge clamping (torch F.interpolate align_corners=False semantics)."""
    import numpy as np

    dst = np.arange(out_size, dtype=np.float64)
    src = np.clip((dst + 0.5) * (in_size / out_size) - 0.5, 0, in_size - 1)
    grid = np.arange(in_size, dtype=np.float64)
    w = np.maximum(0.0, 1.0 - np.abs(src[:, None] - grid[None, :]))
    return jnp.asarray(w, jnp.float32)


def resize_bilinear(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Bilinear NHWC resize with half-pixel centers, equivalent to the
    reference's F.interpolate(mode='bilinear', align_corners=False)
    (/root/reference/models/hrnet.py:218-221).

    Implemented as two matmuls against constant resampling matrices —
    on TPU this rides the MXU instead of the gather path jax.image.resize
    lowers to, which matters because HRNet fuse layers resize every
    branch of every exchange module.
    """
    B, H, W, C = x.shape
    if H == height and W == width:
        return x
    wy = _resize_weights(height, H).astype(x.dtype)   # (out_h, H)
    wx = _resize_weights(width, W).astype(x.dtype)    # (out_w, W)
    out = jnp.einsum("oh,bhwc->bowc", wy, x,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("pw,bowc->bopc", wx, out.astype(x.dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


class DropPath(nn.Module):
    """Per-sample stochastic depth (ref models/hrformer.py:15-35)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if not train or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)

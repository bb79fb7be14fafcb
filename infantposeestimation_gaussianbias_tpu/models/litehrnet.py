"""LiteHRNet — depthwise-separable lightweight HRNet variant.

Proper TPU implementation of the capability sketched in
/root/reference/analysis/hrnet_improvements.py:272-367 (DepthwiseSeparableConv
/ LiteHRNetModule / EfficientHRNet): the full HRNet exchange topology with
depthwise-separable residual blocks, smaller base channels (24), and fewer
exchange modules — for the `lightweight` config variant
(/root/reference/config.py:187-198).
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvNorm, conv_kernel_init, make_norm, resize_bilinear


class DWSeparableBlock(nn.Module):
    """Depthwise 3x3 + pointwise 1x1 with residual when shapes allow."""

    features: int
    strides: int = 1
    norm: str = "batchnorm"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        y = nn.Conv(in_ch, (3, 3), strides=(self.strides, self.strides),
                    padding=1, feature_group_count=in_ch, use_bias=False,
                    kernel_init=conv_kernel_init, dtype=self.dtype,
                    name="dw")(x)
        y = make_norm(self.norm, name="dw_norm")(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    kernel_init=conv_kernel_init, dtype=self.dtype,
                    name="pw")(y)
        y = make_norm(self.norm, name="pw_norm")(y, train)
        if self.strides == 1 and in_ch == self.features:
            y = y + x
        return nn.relu(y)


class LiteHRModule(nn.Module):
    """Exchange unit with depthwise-separable branch blocks."""

    num_channels: Sequence[int]
    num_blocks: int = 2
    norm: str = "batchnorm"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool = False
                 ) -> List[jnp.ndarray]:
        n = len(self.num_channels)
        ys = []
        for i, x in enumerate(xs):
            for b in range(self.num_blocks):
                x = DWSeparableBlock(self.num_channels[i], norm=self.norm,
                                     dtype=self.dtype,
                                     name=f"branch{i}_block{b}")(x, train)
            ys.append(x)
        if n == 1:
            return ys
        fused = []
        for i in range(n):
            acc = None
            for j in range(n):
                if j == i:
                    contrib = ys[j]
                elif j > i:
                    contrib = ConvNorm(self.num_channels[i], 1, use_relu=False,
                                       norm=self.norm, dtype=self.dtype,
                                       name=f"fuse{i}_{j}")(ys[j], train)
                    contrib = resize_bilinear(contrib, ys[i].shape[1],
                                              ys[i].shape[2])
                else:
                    contrib = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        contrib = DWSeparableBlock(
                            self.num_channels[i] if last else self.num_channels[j],
                            strides=2, norm=self.norm, dtype=self.dtype,
                            name=f"fuse{i}_{j}_{k}")(contrib, train)
                acc = contrib if acc is None else acc + contrib
            fused.append(nn.relu(acc))
        return fused


class LiteHRNet(nn.Module):
    """Lightweight HRNet; returns stride-4 highest-resolution features."""

    base_channels: int = 24
    norm: str = "batchnorm"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        C = self.base_channels
        stage_channels = [(C, 2 * C), (C, 2 * C, 4 * C)]
        stage_modules = [2, 2]

        x = ConvNorm(32, 3, strides=2, norm=self.norm, dtype=self.dtype,
                     name="stem1")(x, train)
        x = ConvNorm(32, 3, strides=2, norm=self.norm, dtype=self.dtype,
                     name="stem2")(x, train)
        x = DWSeparableBlock(C, norm=self.norm, dtype=self.dtype,
                             name="layer1")(x, train)

        xs = [x]
        for s, (channels, modules) in enumerate(
                zip(stage_channels, stage_modules)):
            new_xs = []
            for i, ch in enumerate(channels):
                if i < len(xs):
                    if xs[i].shape[-1] != ch:
                        new_xs.append(ConvNorm(
                            ch, 3, norm=self.norm, dtype=self.dtype,
                            name=f"transition{s + 1}_{i}")(xs[i], train))
                    else:
                        new_xs.append(xs[i])
                else:
                    new_xs.append(ConvNorm(
                        ch, 3, strides=2, norm=self.norm, dtype=self.dtype,
                        name=f"transition{s + 1}_{i}")(xs[-1], train))
            xs = new_xs
            for m in range(modules):
                xs = LiteHRModule(channels, norm=self.norm, dtype=self.dtype,
                                  name=f"stage{s + 2}_module{m}")(xs, train)
        return xs[0]


def litehrnet(norm: str = "batchnorm", dtype: Any = jnp.float32) -> LiteHRNet:
    return LiteHRNet(base_channels=24, norm=norm, dtype=dtype)

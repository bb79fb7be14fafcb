"""HRNet backbone — multi-resolution CNN, NHWC flax implementation.

Capability-parity rebuild of /root/reference/models/hrnet.py:230-458:
stem (2x stride-2 conv) -> 4 Bottlenecks -> three exchange stages of
HighResolutionModules (BasicBlock branches + all-pairs fusion: 1x1
conv + bilinear upsample upward, strided 3x3 chains downward), returning
the highest-resolution branch (stride 4, C = base_channels).

Stage layout (identical to the reference):
  stage2: 1 module,  2 branches, 4 blocks, channels (C, 2C)
  stage3: 4 modules, 3 branches, 4 blocks, channels (C, 2C, 4C)
  stage4: 3 modules, 4 branches, 4 blocks, channels (C, 2C, 4C, 8C)
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import BasicBlock, Bottleneck, ConvNorm, resize_bilinear


class HRModule(nn.Module):
    """One exchange unit: per-branch residual blocks + all-pairs fusion
    (ref models/hrnet.py:106-227)."""

    num_channels: Sequence[int]
    num_blocks: int = 4
    norm: str = "batchnorm"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool = False
                 ) -> List[jnp.ndarray]:
        n = len(self.num_channels)
        # Branch blocks.
        ys = []
        for i, x in enumerate(xs):
            for b in range(self.num_blocks):
                x = BasicBlock(self.num_channels[i], norm=self.norm,
                               dtype=self.dtype, name=f"branch{i}_block{b}")(
                                   x, train)
            ys.append(x)
        if n == 1:
            return ys

        # All-pairs fuse: output i sums contributions from every branch j.
        fused = []
        for i in range(n):
            acc = None
            for j in range(n):
                if j == i:
                    contrib = ys[j]
                elif j > i:
                    # channel-project then bilinear upsample to branch i res
                    contrib = ConvNorm(self.num_channels[i], 1, use_relu=False,
                                       norm=self.norm, dtype=self.dtype,
                                       name=f"fuse{i}_{j}")(ys[j], train)
                    contrib = resize_bilinear(contrib, ys[i].shape[1],
                                              ys[i].shape[2])
                else:
                    # chain of stride-2 3x3 convs; last one changes channels
                    # and has no ReLU (ref models/hrnet.py:178-191)
                    contrib = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        contrib = ConvNorm(
                            self.num_channels[i] if last else self.num_channels[j],
                            3, strides=2, use_relu=not last, norm=self.norm,
                            dtype=self.dtype, name=f"fuse{i}_{j}_{k}")(
                                contrib, train)
                acc = contrib if acc is None else acc + contrib
            fused.append(nn.relu(acc))
        return fused


class HRNet(nn.Module):
    """HRNet backbone; returns the stride-4 highest-resolution features."""

    base_channels: int = 32
    norm: str = "batchnorm"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        C = self.base_channels
        stage_channels = [
            (C, 2 * C),
            (C, 2 * C, 4 * C),
            (C, 2 * C, 4 * C, 8 * C),
        ]
        stage_modules = [1, 4, 3]

        # Stem: two stride-2 3x3 convs to 64ch (ref :252-257).
        x = ConvNorm(64, 3, strides=2, norm=self.norm, dtype=self.dtype,
                     name="stem1")(x, train)
        x = ConvNorm(64, 3, strides=2, norm=self.norm, dtype=self.dtype,
                     name="stem2")(x, train)

        # Stage 1: 4 Bottlenecks 64 -> 256 (ref :260).
        for b in range(4):
            x = Bottleneck(64, norm=self.norm, dtype=self.dtype,
                           name=f"layer1_block{b}")(x, train)

        # Transitions + exchange stages.
        xs = [x]
        for s, (channels, modules) in enumerate(
                zip(stage_channels, stage_modules)):
            # Transition: adapt existing branches (3x3 conv when channels
            # change) and spawn a new lower branch via stride-2 conv
            # (ref :330-360).
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
                xs = HRModule(channels, norm=self.norm, dtype=self.dtype,
                              name=f"stage{s + 2}_module{m}")(xs, train)

        return xs[0]


def hrnet_w32(norm: str = "batchnorm", dtype: Any = jnp.float32) -> HRNet:
    return HRNet(base_channels=32, norm=norm, dtype=dtype)


def hrnet_w48(norm: str = "batchnorm", dtype: Any = jnp.float32) -> HRNet:
    return HRNet(base_channels=48, norm=norm, dtype=dtype)

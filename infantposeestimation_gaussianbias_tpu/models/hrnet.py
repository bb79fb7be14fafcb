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

from typing import Any, List, Optional, Sequence, Tuple

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
    quant: bool = False
    calibrate: bool = False
    fold: bool = False

    @nn.compact
    def __call__(self, xs, train: bool = False):
        n = len(self.num_channels)
        kw = dict(norm=self.norm, dtype=self.dtype, quant=self.quant,
                  calibrate=self.calibrate, fold=self.fold)
        # Branch blocks.
        ys = []
        for i, x in enumerate(xs):
            for b in range(self.num_blocks):
                x = BasicBlock(self.num_channels[i],
                               name=f"branch{i}_block{b}", **kw)(x, train)
            ys.append(x)
        if n == 1:
            return ys

        # All-pairs fuse: output i sums contributions from every branch j.
        # int8 mode: every contribution lands in f32 (the identity branch
        # dequantizes, projection/downsample convs skip requant), the sum +
        # ReLU is one fusion, and the result requantizes with a per-output
        # calibrated scale.
        fused = []
        for i in range(n):
            h_i, w_i = ys[i].shape[1], ys[i].shape[2]
            acc = None
            for j in range(n):
                if j == i:
                    contrib = ys[j].dequantize(jnp.float32) \
                        if self.quant else ys[j]
                elif j > i:
                    # channel-project then bilinear upsample to branch i res
                    contrib = ConvNorm(self.num_channels[i], 1,
                                       use_relu=False, quant_out=False,
                                       name=f"fuse{i}_{j}", **kw)(ys[j], train)
                    contrib = resize_bilinear(contrib, h_i, w_i)
                else:
                    # chain of stride-2 3x3 convs; last one changes channels
                    # and has no ReLU (ref models/hrnet.py:178-191)
                    contrib = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        contrib = ConvNorm(
                            self.num_channels[i] if last else self.num_channels[j],
                            3, strides=2, use_relu=not last,
                            quant_out=not last,
                            name=f"fuse{i}_{j}_{k}", **kw)(contrib, train)
                acc = contrib if acc is None else acc + contrib
            out = nn.relu(acc)
            if self.quant:
                from ..ops import quant as quant_ops
                out = quant_ops.requantize(
                    out, self.variable("qparams", f"fused{i}_scale").value)
            elif self.calibrate:
                from .layers import sow_absmax
                sow_absmax(self, f"fused{i}_absmax", out)
            fused.append(out)
        return fused


class HRNet(nn.Module):
    """HRNet backbone; returns the stride-4 highest-resolution features."""

    base_channels: int = 32
    norm: str = "batchnorm"
    dtype: Any = jnp.float32
    quant: bool = False
    calibrate: bool = False
    fold: bool = False
    # remat: recompute each exchange module's activations in the backward
    # pass instead of storing them (activation-HBM vs FLOPs trade).
    remat: bool = False
    # Modules per exchange stage; None = the reference layout (1, 4, 3)
    # (ref models/hrnet.py:230-441).  A reduced layout such as (1, 1, 1)
    # keeps every structural element (all four stages, all-pairs fusion,
    # Bottleneck stage-1) while compiling several times faster — used by
    # the multi-chip dry run on CPU hosts.
    stage_modules: Optional[Tuple[int, int, int]] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        C = self.base_channels
        stage_channels = [
            (C, 2 * C),
            (C, 2 * C, 4 * C),
            (C, 2 * C, 4 * C, 8 * C),
        ]
        stage_modules = self.stage_modules or (1, 4, 3)
        kw = dict(norm=self.norm, dtype=self.dtype, quant=self.quant,
                  calibrate=self.calibrate, fold=self.fold)

        if self.quant:
            from ..ops import quant as quant_ops
            x = quant_ops.requantize(
                x.astype(jnp.float32),
                self.variable("qparams", "input_scale").value)
        elif self.calibrate:
            from .layers import sow_absmax
            sow_absmax(self, "input_absmax", x)

        # Stem: two stride-2 3x3 convs to 64ch (ref :252-257).
        x = ConvNorm(64, 3, strides=2, name="stem1", **kw)(x, train)
        x = ConvNorm(64, 3, strides=2, name="stem2", **kw)(x, train)

        # Stage 1: 4 Bottlenecks 64 -> 256 (ref :260).
        for b in range(4):
            x = Bottleneck(64, name=f"layer1_block{b}", **kw)(x, train)

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
                            ch, 3, name=f"transition{s + 1}_{i}", **kw)(
                                xs[i], train))
                    else:
                        new_xs.append(xs[i])
                else:
                    new_xs.append(ConvNorm(
                        ch, 3, strides=2, name=f"transition{s + 1}_{i}",
                        **kw)(xs[-1], train))
            xs = new_xs
            mod_cls = (nn.remat(HRModule, static_argnums=(2,))
                       if self.remat else HRModule)
            for m in range(modules):
                xs = mod_cls(channels, name=f"stage{s + 2}_module{m}",
                             **kw)(xs, train)

        return xs[0]


def hrnet_w32(norm: str = "batchnorm", dtype: Any = jnp.float32,
              quant: bool = False, calibrate: bool = False,
              fold: bool = False, remat: bool = False,
              stage_modules: Optional[Tuple[int, int, int]] = None) -> HRNet:
    return HRNet(base_channels=32, norm=norm, dtype=dtype, quant=quant,
                 calibrate=calibrate, fold=fold, remat=remat,
                 stage_modules=stage_modules)


def hrnet_w48(norm: str = "batchnorm", dtype: Any = jnp.float32,
              quant: bool = False, calibrate: bool = False,
              fold: bool = False, remat: bool = False,
              stage_modules: Optional[Tuple[int, int, int]] = None) -> HRNet:
    return HRNet(base_channels=48, norm=norm, dtype=dtype, quant=quant,
                 calibrate=calibrate, fold=fold, remat=remat,
                 stage_modules=stage_modules)

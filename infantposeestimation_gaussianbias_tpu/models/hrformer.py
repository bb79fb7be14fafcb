"""HRFormer backbone — multi-resolution transformer, NHWC flax implementation.

Capability-parity rebuild of /root/reference/models/hrformer.py:494-846:
the HRNet 4-stage exchange topology with transformer branch blocks
(LayerNorm -> window MSA with relative position bias -> DropPath residual
-> LayerNorm -> MLP).  The stem, stage-1 Bottlenecks, transitions, and
fuse layers are convolutional with BatchNorm, exactly like the reference.

Base:  channels (78, 156, 312, 624), heads (2, 4, 8, 16), window 7,
       modules per stage (1, 4, 2), 2 blocks per branch, drop-path 0.2.
Small: channels (32, 64, 128, 256), heads (1, 2, 4, 8), drop-path 0.1.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import msa
from .layers import (
    Bottleneck,
    ConvNorm,
    DropPath,
    QDense,
    resize_bilinear,
    sow_absmax,
)

trunc_init = nn.initializers.truncated_normal(stddev=0.02)


def _fused_blocks_enabled(dim: int) -> bool:
    """Fused half-block kernels (ops/pallas/fused_block.py) gate.

    Round-5 block-level A/B (BENCH.md): the fused kernels WIN at wide
    channels (C=128 fwd+bwd 1.91 vs 2.19 ms, C=256 1.16 vs 1.25 — the
    HBM-trip savings dominate once lanes fill) but LOSE at narrow ones
    (C=32: 11.7 vs 8.7 — Mosaic's compute at 4x lane padding costs more
    than the streaming saved).  Default: fused only where measured to
    win (C >= IPE_FUSED_BLOCK_MIN_C, default 128); IPE_FUSED_BLOCK=0
    disables entirely, =1 forces all blocks (A/B)."""
    import os

    flag = os.environ.get("IPE_FUSED_BLOCK", "0")
    if flag == "0":
        return False
    if flag == "1":
        return True
    # "auto": fused only at the widths where the BLOCK-level A/B wins.
    # Shipped default is OFF: the model-level step measured 286.1 ms
    # with this gate vs 274.8 ms for the per-op kernel path — the
    # isolated C>=128 wins do not survive the full program's fusion
    # boundaries (BENCH.md round-5 negative result).
    return dim >= int(os.environ.get("IPE_FUSED_BLOCK_MIN_C", "128"))

# Dense-PTQ width gate: int8 only pays off when the contraction dim fills
# the MXU; narrow layers (C=32/64 high-res branches) lose to the extra
# activation-quantization pass (BENCH.md round-2 measurement), so they
# stay in the compute dtype.
QUANT_MIN_FEATURES = 128


class WindowAttention(nn.Module):
    """W-MSA with relative position bias over (nW, N, C) windows."""

    dim: int
    window_size: int
    num_heads: int
    with_rpe: bool = True
    dtype: Any = jnp.float32
    use_pallas: bool = False
    # Device mesh for the shard_map-wrapped kernel: with a multi-device
    # ('data','model') mesh the fused kernel runs per-shard (windows over
    # 'data', heads over 'model' when divisible) instead of forcing its
    # operands to replicate — see window_attention_pallas_qkv_sharded.
    mesh: Any = None
    quant: bool = False
    calibrate: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        nW, N, C = x.shape
        h = self.num_heads
        hd = C // h

        wide = C >= QUANT_MIN_FEATURES
        if self.calibrate and wide:
            sow_absmax(self, "qkv_in_absmax", x)
        if self.quant and wide:
            qkv = QDense(3 * C, name="qkv")(x).astype(self.dtype)
        else:
            qkv = nn.Dense(3 * C, use_bias=True, kernel_init=trunc_init,
                           dtype=self.dtype, name="qkv")(x)

        bias = None
        if self.with_rpe:
            table = self.param(
                "rpe_table", trunc_init,
                ((2 * self.window_size - 1) ** 2, h))
            idx = jnp.asarray(msa.relative_position_index(self.window_size))
            bias = table[idx.reshape(-1)].reshape(N, N, h).transpose(2, 0, 1)

        if self.use_pallas and (bias is not None or not train):
            # the fused kernel consumes the qkv Dense output and produces
            # the proj Dense input directly — no transposes at the
            # pallas_call boundary (the head-major variant's relayout
            # copies were the round-1 model-level loss; BENCH.md records
            # 1.50x/1.64x model-level wins for this layout).  With RPE the
            # custom-VJP variant (Pallas recompute-probs backward kernel)
            # makes training fused too; the rare no-RPE config falls back
            # to XLA for training.
            from ..ops.pallas.window_msa import (
                window_attention_pallas_qkv,
                window_attention_pallas_qkv_sharded,
                window_attention_pallas_qkv_vjp,
            )
            sharded = (self.mesh is not None
                       and self.mesh.devices.size > 1)
            if sharded:
                out = window_attention_pallas_qkv_sharded(
                    qkv, bias, h, self.mesh,
                    differentiable=bias is not None)
            elif bias is not None:
                out = window_attention_pallas_qkv_vjp(qkv, bias, h)
            else:
                out = window_attention_pallas_qkv(qkv, None, h)
        else:
            qkv = qkv.reshape(nW, N, 3, h, hd).transpose(2, 0, 3, 1, 4)
            out = msa.window_attention(qkv[0], qkv[1], qkv[2], bias)
            out = out.transpose(0, 2, 1, 3).reshape(nW, N, C)
        if self.calibrate and wide:
            sow_absmax(self, "proj_in_absmax", out)
        if self.quant and wide:
            return QDense(C, name="proj")(out).astype(self.dtype)
        return nn.Dense(C, kernel_init=trunc_init, dtype=self.dtype,
                        name="proj")(out)


class Mlp(nn.Module):
    """Dense -> GELU -> Dense (ref models/hrformer.py:38-64)."""

    hidden: int
    out: int
    dtype: Any = jnp.float32
    quant: bool = False
    calibrate: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        wide1 = x.shape[-1] >= QUANT_MIN_FEATURES
        wide2 = self.hidden >= QUANT_MIN_FEATURES
        if self.calibrate and wide1:
            sow_absmax(self, "fc1_in_absmax", x)
        if self.quant and wide1:
            x = QDense(self.hidden, name="fc1")(x).astype(self.dtype)
        else:
            x = nn.Dense(self.hidden, kernel_init=trunc_init,
                         dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        if self.calibrate and wide2:
            sow_absmax(self, "fc2_in_absmax", x)
        if self.quant and wide2:
            return QDense(self.out, name="fc2")(x).astype(self.dtype)
        return nn.Dense(self.out, kernel_init=trunc_init, dtype=self.dtype,
                        name="fc2")(x)


class HRFormerBlock(nn.Module):
    """LN -> window MSA -> droppath residual -> LN -> MLP residual
    (ref models/hrformer.py:203-293), operating on NHWC feature maps."""

    dim: int
    num_heads: int
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    with_rpe: bool = True
    dtype: Any = jnp.float32
    use_pallas: bool = False
    mesh: Any = None
    quant: bool = False
    calibrate: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, H, W, C = x.shape
        # Fused half-block path (round 5): the per-op pipeline below
        # streams the feature map through HBM ~12-14 times per block —
        # the measured bottleneck at HRFormer's tiny channel widths
        # (BENCH.md round-5 decomposition).  ops/pallas/fused_block.py
        # collapses each half into ONE kernel (map streams twice).  The
        # unfused path remains the init path (it owns the parameter
        # tree), the CPU/test path, the int8/calibration path, and the
        # sharded-mesh path.
        fused = (self.use_pallas and self.with_rpe and self.mesh is None
                 and not self.quant and not self.calibrate
                 and not self.is_initializing()
                 and _fused_blocks_enabled(self.dim))
        if fused:
            return self._fused(x, train)
        shortcut = x
        # epsilon=1e-5 matches torch nn.LayerNorm so imported reference
        # checkpoints reproduce bit-comparable activations.  Stats stay
        # f32; the output drops to the compute dtype BEFORE the window
        # partition so the reshape+transpose moves half the bytes (the
        # qkv Dense would cast it anyway).
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)
        wins, (Hp, Wp) = msa.window_partition(y.astype(self.dtype),
                                              self.window_size)
        wins = WindowAttention(self.dim, self.window_size, self.num_heads,
                               self.with_rpe, dtype=self.dtype,
                               use_pallas=self.use_pallas, mesh=self.mesh,
                               quant=self.quant, calibrate=self.calibrate,
                               name="attn")(wins, train)
        wins = wins.reshape(-1, self.window_size, self.window_size, C)
        y = msa.window_reverse(wins, self.window_size, H, W, Hp, Wp)
        x = shortcut + DropPath(self.drop_path, name="dp1")(y, train)

        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x)
        y = Mlp(int(C * self.mlp_ratio), C, dtype=self.dtype,
                quant=self.quant, calibrate=self.calibrate,
                name="mlp")(y.astype(self.dtype))
        return x + DropPath(self.drop_path, name="dp2")(y, train)

    def _droppath_scale(self, B: int, train: bool) -> jnp.ndarray:
        """Per-sample stochastic-depth scale (B,), matching DropPath."""
        if not train or self.drop_path == 0.0:
            return jnp.ones((B,), jnp.float32)
        keep = 1.0 - self.drop_path
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, (B,))
        return mask.astype(jnp.float32) / keep

    def _fused(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        """Apply-time fused path: reads the params the unfused init path
        created (identical tree, so checkpoints/imports are unaffected)
        and runs the two fused half-block kernels on ONE window layout
        (single partition/reverse per block)."""
        from ..ops.pallas.fused_block import fused_attn_half, fused_mlp_half

        B, H, W, C = x.shape
        ws = self.window_size
        p_n1 = self.get_variable("params", "norm1")
        p_n2 = self.get_variable("params", "norm2")
        p_attn = self.get_variable("params", "attn")
        p_mlp = self.get_variable("params", "mlp")

        table = p_attn["rpe_table"]
        idx = jnp.asarray(msa.relative_position_index(ws))
        N = ws * ws
        rpe = table[idx.reshape(-1)].reshape(N, N, self.num_heads)
        rpe = rpe.transpose(2, 0, 1).astype(jnp.float32)

        xw, (Hp, Wp) = msa.window_partition(x.astype(self.dtype), ws)
        nW = xw.shape[0]
        nwin = nW // B

        def dp_vec(scale_b):
            # per-sample DropPath scales, lane-padded to 128 multiples —
            # the kernels gather per window/token from this tiny vector
            # (a per-row operand would stream 128x lane-padded)
            BP = -(-B // 128) * 128
            return jnp.pad(scale_b, (0, BP - B))[None]

        dp1 = dp_vec(self._droppath_scale(B, train))
        xw = fused_attn_half(
            xw,
            p_n1["scale"].astype(jnp.float32)[None],
            p_n1["bias"].astype(jnp.float32)[None],
            p_attn["qkv"]["kernel"].astype(self.dtype),
            p_attn["qkv"]["bias"].astype(jnp.float32)[None],
            rpe,
            p_attn["proj"]["kernel"].astype(self.dtype),
            p_attn["proj"]["bias"].astype(jnp.float32)[None],
            dp1, self.num_heads, (H, W, ws))

        # MLP is token-pointwise, so it runs in the SAME window layout
        # (pad tokens compute garbage that window_reverse crops off) —
        # one partition + one reverse per block instead of two.
        dp2 = dp_vec(self._droppath_scale(B, train))
        y2 = fused_mlp_half(
            xw.reshape(nW * N, C),
            p_n2["scale"].astype(jnp.float32)[None],
            p_n2["bias"].astype(jnp.float32)[None],
            p_mlp["fc1"]["kernel"].astype(self.dtype),
            p_mlp["fc1"]["bias"].astype(jnp.float32)[None],
            p_mlp["fc2"]["kernel"].astype(self.dtype),
            p_mlp["fc2"]["bias"].astype(jnp.float32)[None],
            dp2, nwin * N)
        wins = y2.reshape(nW, ws, ws, C)
        return msa.window_reverse(wins, ws, H, W, Hp, Wp)


class HRFormerModule(nn.Module):
    """Exchange unit: transformer branches + conv all-pairs fusion
    (ref models/hrformer.py:347-491; fuse identical to HRNet's)."""

    num_channels: Sequence[int]
    num_heads: Sequence[int]
    num_blocks: int = 2
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    norm: str = "batchnorm"
    dtype: Any = jnp.float32
    use_pallas: bool = False
    mesh: Any = None
    quant: bool = False
    calibrate: bool = False
    fold: bool = False

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool = False
                 ) -> List[jnp.ndarray]:
        n = len(self.num_channels)
        ys = []
        for i, x in enumerate(xs):
            for b in range(self.num_blocks):
                x = HRFormerBlock(
                    self.num_channels[i], self.num_heads[i],
                    self.window_size, self.mlp_ratio, self.drop_path,
                    dtype=self.dtype, use_pallas=self.use_pallas,
                    mesh=self.mesh,
                    quant=self.quant, calibrate=self.calibrate,
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
                                       fold=self.fold,
                                       name=f"fuse{i}_{j}")(ys[j], train)
                    contrib = resize_bilinear(contrib, ys[i].shape[1],
                                              ys[i].shape[2])
                else:
                    contrib = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        contrib = ConvNorm(
                            self.num_channels[i] if last else self.num_channels[j],
                            3, strides=2, use_relu=not last, norm=self.norm,
                            dtype=self.dtype, fold=self.fold,
                            name=f"fuse{i}_{j}_{k}")(contrib, train)
                acc = contrib if acc is None else acc + contrib
            fused.append(nn.relu(acc))
        return fused


class HRFormer(nn.Module):
    """HRFormer backbone; returns stride-4 highest-resolution features."""

    channels: Tuple[int, ...] = (78, 156, 312, 624)
    num_heads: Tuple[int, ...] = (2, 4, 8, 16)
    stage_modules: Tuple[int, ...] = (1, 4, 2)
    num_blocks: int = 2
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2
    norm: str = "batchnorm"
    dtype: Any = jnp.float32
    use_pallas: bool = False
    mesh: Any = None
    remat: bool = False
    # int8 PTQ: quantizes the transformer Dense layers (qkv/proj/fc1/fc2 —
    # where the FLOPs are); the conv stem/transitions/fuses and all norms
    # stay in the compute dtype, so no QTensor plumbing between modules.
    quant: bool = False
    calibrate: bool = False
    fold: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # Conv stem + 2 Bottlenecks (ref stage1_num_blocks=(2,)).
        x = ConvNorm(64, 3, strides=2, norm=self.norm, dtype=self.dtype,
                     fold=self.fold, name="stem1")(x, train)
        x = ConvNorm(64, 3, strides=2, norm=self.norm, dtype=self.dtype,
                     fold=self.fold, name="stem2")(x, train)
        for b in range(2):
            x = Bottleneck(64, norm=self.norm, dtype=self.dtype,
                           fold=self.fold,
                           name=f"layer1_block{b}")(x, train)

        xs = [x]
        for s, modules in enumerate(self.stage_modules):
            channels = self.channels[: s + 2]
            heads = self.num_heads[: s + 2]
            new_xs = []
            for i, ch in enumerate(channels):
                if i < len(xs):
                    if xs[i].shape[-1] != ch:
                        new_xs.append(ConvNorm(
                            ch, 3, norm=self.norm, dtype=self.dtype,
                            fold=self.fold,
                            name=f"transition{s + 1}_{i}")(xs[i], train))
                    else:
                        new_xs.append(xs[i])
                else:
                    new_xs.append(ConvNorm(
                        ch, 3, strides=2, norm=self.norm, dtype=self.dtype,
                        fold=self.fold,
                        name=f"transition{s + 1}_{i}")(xs[-1], train))
            xs = new_xs
            # remat over exchange modules (same granularity as HRNet's,
            # models/hrnet.py): trades recompute for activation memory —
            # the lever that fits hrformer_base training at b=128 on one
            # v5e (without it the step OOMs HBM by ~0.4 GB, BENCH.md).
            mod_cls = (nn.remat(HRFormerModule, static_argnums=(2,))
                       if self.remat else HRFormerModule)
            for m in range(modules):
                xs = mod_cls(
                    channels, heads, self.num_blocks, self.window_size,
                    self.mlp_ratio, self.drop_path_rate, norm=self.norm,
                    dtype=self.dtype, use_pallas=self.use_pallas,
                    mesh=self.mesh,
                    quant=self.quant, calibrate=self.calibrate,
                    fold=self.fold,
                    name=f"stage{s + 2}_module{m}")(xs, train)
        return xs[0]


def hrformer_base(norm: str = "batchnorm", dtype: Any = jnp.float32,
                  use_pallas: bool = False, mesh: Any = None,
                  quant: bool = False,
                  calibrate: bool = False, fold: bool = False,
                  remat: bool = False, window_size: int = 7) -> HRFormer:
    return HRFormer(channels=(78, 156, 312, 624), num_heads=(2, 4, 8, 16),
                    drop_path_rate=0.2, norm=norm, dtype=dtype,
                    use_pallas=use_pallas, mesh=mesh,
                    quant=quant, calibrate=calibrate,
                    fold=fold, remat=remat, window_size=window_size)


def hrformer_small(norm: str = "batchnorm", dtype: Any = jnp.float32,
                   use_pallas: bool = False, mesh: Any = None,
                   quant: bool = False,
                   calibrate: bool = False, fold: bool = False,
                   remat: bool = False, window_size: int = 7) -> HRFormer:
    return HRFormer(channels=(32, 64, 128, 256), num_heads=(1, 2, 4, 8),
                    drop_path_rate=0.1, norm=norm, dtype=dtype,
                    use_pallas=use_pallas, mesh=mesh,
                    quant=quant, calibrate=calibrate,
                    fold=fold, remat=remat, window_size=window_size)

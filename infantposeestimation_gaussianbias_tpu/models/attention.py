"""Attention add-on modules: CBAM and a transformer-encoder neck.

Proper flax implementations of the improvement sketches in
/root/reference/analysis/hrnet_improvements.py (CBAM :374-443,
transformer add-on :60-140): channel + spatial attention that can wrap any
backbone's output features, and a small transformer encoder over flattened
feature tokens for global context.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import conv_kernel_init


class ChannelAttention(nn.Module):
    """Squeeze (avg+max pool) -> shared MLP -> sigmoid channel gate."""

    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        hidden = max(C // self.reduction, 4)
        mlp1 = nn.Dense(hidden, dtype=self.dtype, name="fc1")
        mlp2 = nn.Dense(C, dtype=self.dtype, name="fc2")
        avg = jnp.mean(x, axis=(1, 2))
        mx = jnp.max(x, axis=(1, 2))
        gate = jax.nn.sigmoid(mlp2(nn.relu(mlp1(avg))) +
                              mlp2(nn.relu(mlp1(mx))))
        return x * gate[:, None, None, :].astype(x.dtype)


class SpatialAttention(nn.Module):
    """Channel-pooled (avg+max) 7x7 conv -> sigmoid spatial gate."""

    kernel: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        g = jnp.concatenate([avg, mx], axis=-1)
        g = nn.Conv(1, (self.kernel, self.kernel), padding=self.kernel // 2,
                    kernel_init=conv_kernel_init, dtype=self.dtype,
                    name="conv")(g)
        return x * jax.nn.sigmoid(g).astype(x.dtype)


class CBAM(nn.Module):
    """Convolutional Block Attention Module: channel then spatial gate."""

    reduction: int = 16
    spatial_kernel: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ChannelAttention(self.reduction, dtype=self.dtype, name="ca")(x)
        return SpatialAttention(self.spatial_kernel, dtype=self.dtype,
                                name="sa")(x)


class TransformerNeck(nn.Module):
    """Small transformer encoder over flattened backbone tokens for global
    context (the sketch's TransformerEncoder add-on), residual to the
    features so it is drop-in for any backbone output."""

    num_layers: int = 2
    num_heads: int = 4
    mlp_ratio: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, H, W, C = x.shape
        tokens = x.reshape(B, H * W, C)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, H * W, C))
        tokens = tokens + pos.astype(tokens.dtype)
        for i in range(self.num_layers):
            y = nn.LayerNorm(dtype=jnp.float32, name=f"ln1_{i}")(tokens)
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, dtype=self.dtype,
                name=f"attn_{i}")(y, y)
            tokens = tokens + y
            y = nn.LayerNorm(dtype=jnp.float32, name=f"ln2_{i}")(tokens)
            y = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype,
                         name=f"mlp1_{i}")(y)
            y = nn.gelu(y)
            y = nn.Dense(C, dtype=self.dtype, name=f"mlp2_{i}")(y)
            tokens = tokens + y
        return x + tokens.reshape(B, H, W, C).astype(x.dtype)

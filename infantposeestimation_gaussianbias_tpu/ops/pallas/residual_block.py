"""Pallas TPU kernel: fused HRNet residual-block chain (inference).

An HRNet branch runs 4 BasicBlocks back to back — 8 conv+BN(+ReLU) ops
whose intermediates all round-trip HBM under XLA.  At branch-0 shapes
(64x48x32) a whole image's activations are ~200 KB, so this kernel keeps
the ENTIRE chain in VMEM: grid = batch; per image it does
    for each block: y = relu(conv3x3(x)*a1+b1); x = relu(conv3x3(y)*a2+b2 + x)
with the convs expressed as one im2col matmul each (9 shifted copies
concatenated -> (H*W, 9C) @ (9C, C) on the MXU) and the BatchNorm folded
into per-channel (a, b) constants (inference only).

HBM traffic per image: read x once + write out once, vs ~10 tensor
round-trips for the unfused graph.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x3_via_im2col(xp, w9, H, W, C):
    """xp: (H+2, W+2, C) padded input; w9: (9*C, Cout).
    Returns (H, W, Cout) f32.

    Mosaic does not support concatenating shifted slices along channels,
    so the im2col matmul is computed as 9 tap-wise matmul accumulations
    (each (H*W, C) @ (C, Cout) on the MXU).
    """
    acc = None
    for dy in range(3):
        for dx in range(3):
            tap = xp[dy:dy + H, dx:dx + W, :].reshape(H * W, C)
            w_tap = w9[(dy * 3 + dx) * C:(dy * 3 + dx + 1) * C, :]
            y = jax.lax.dot_general(
                tap, w_tap, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
    return acc.reshape(H, W, -1)


def _chain_kernel(x_ref, w_ref, ab_ref, out_ref, *, num_blocks: int,
                  H: int, W: int, C: int):
    """Blocks: x (1,H,W,C); w (num_blocks*2, 9C, C); ab (num_blocks*2, 2, C)."""
    x = x_ref[0].astype(jnp.float32)
    for b in range(num_blocks):
        w1 = w_ref[2 * b]
        w2 = w_ref[2 * b + 1]
        a1, b1 = ab_ref[2 * b, 0], ab_ref[2 * b, 1]
        a2, b2 = ab_ref[2 * b + 1, 0], ab_ref[2 * b + 1, 1]
        xp = jnp.pad(x.astype(w1.dtype), ((1, 1), (1, 1), (0, 0)))
        y = _conv3x3_via_im2col(xp, w1, H, W, C)
        y = jax.nn.relu(y * a1[None, None, :] + b1[None, None, :])
        yp = jnp.pad(y.astype(w2.dtype), ((1, 1), (1, 1), (0, 0)))
        z = _conv3x3_via_im2col(yp, w2, H, W, C)
        x = jax.nn.relu(z * a2[None, None, :] + b2[None, None, :] + x)
    out_ref[0] = x.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_blocks",))
def fused_residual_chain(
    x: jnp.ndarray,
    weights: jnp.ndarray,
    affines: jnp.ndarray,
    num_blocks: int,
) -> jnp.ndarray:
    """Run ``num_blocks`` BasicBlocks fused in VMEM.

    Args:
      x: (B, H, W, C) input features.
      weights: (num_blocks*2, 9*C, C) conv kernels, im2col layout — from
               HWIO (3,3,C,C) via reshape(9*C, C); tap order (dy, dx, c).
      affines: (num_blocks*2, 2, C) folded BN (a, b) per conv.
      num_blocks: chain length (HRNet uses 4).
    Returns:
      (B, H, W, C).
    """
    B, H, W, C = x.shape
    kern = functools.partial(_chain_kernel, num_blocks=num_blocks,
                             H=H, W=W, C=C)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_blocks * 2, 9 * C, C), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_blocks * 2, 2, C), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
    )(x, weights, affines)


def pack_basic_block_params(block_params: Sequence[dict],
                            block_stats: Sequence[dict],
                            dtype=jnp.bfloat16,
                            eps: float = 1e-5
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold a list of BasicBlock param/stat subtrees into the kernel's
    (weights, affines) arrays.

    Each entry must be the {'conv1': {'conv': {'kernel'}, 'norm': {'bn':
    {'scale','bias'}}}, 'conv2': ...} tree produced by models.layers
    BasicBlock, with matching batch_stats {'conv1': {'norm': {'bn':
    {'mean','var'}}}, ...}.
    """
    ws, abs_ = [], []
    for p, s in zip(block_params, block_stats):
        for conv in ("conv1", "conv2"):
            k = jnp.asarray(p[conv]["conv"]["kernel"])  # (3,3,C,C)
            C = k.shape[-1]
            ws.append(k.reshape(9 * C, C).astype(dtype))
            bn_p = p[conv]["norm"]["bn"]
            bn_s = s[conv]["norm"]["bn"]
            a = jnp.asarray(bn_p["scale"]) * jax.lax.rsqrt(
                jnp.asarray(bn_s["var"]) + eps)
            b = jnp.asarray(bn_p["bias"]) - jnp.asarray(bn_s["mean"]) * a
            abs_.append(jnp.stack([a, b]).astype(jnp.float32))
    return jnp.stack(ws), jnp.stack(abs_)

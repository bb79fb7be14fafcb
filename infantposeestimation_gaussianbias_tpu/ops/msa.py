"""Window multi-head self-attention primitives.

TPU-native rebuild of the reference's window MSA machinery
(/root/reference/models/hrformer.py:67-200): NHWC window partition with
padding to window multiples, scaled-dot-product attention over 49-token
windows with a learned relative-position-bias table.

The attention core is factored out as ``window_attention`` so the XLA
reference path (einsums; XLA fuses these well at 7x7=49 token windows) and
the Pallas kernel (ops/pallas/window_msa.py) share one contract and can be
parity-tested against each other.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def relative_position_index(window_size: int) -> np.ndarray:
    """Static (ws^2, ws^2) index into the (2ws-1)^2 RPE bias table.

    Same pairwise construction as the reference
    (/root/reference/models/hrformer.py:153-165).
    """
    ws = window_size
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))  # (2, ws, ws)
    flat = coords.reshape(2, -1)  # (2, N)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # (N, N)


def window_partition(x: jnp.ndarray, window_size: int
                     ) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """(B, H, W, C) -> (B * nH * nW, ws*ws, C), zero-padding H/W up to
    window multiples (ref models/hrformer.py:67-91)."""
    B, H, W, C = x.shape
    ws = window_size
    Hp = -(-H // ws) * ws
    Wp = -(-W // ws) * ws
    if Hp != H or Wp != W:
        x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)
    return x, (Hp, Wp)


def window_reverse(windows: jnp.ndarray, window_size: int, H: int, W: int,
                   Hp: int, Wp: int) -> jnp.ndarray:
    """Inverse of window_partition, cropping the padding back off."""
    ws = window_size
    C = windows.shape[-1]
    B = windows.shape[0] // ((Hp // ws) * (Wp // ws))
    x = windows.reshape(B, Hp // ws, Wp // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    return x[:, :H, :W, :]


def window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Scaled-dot-product attention over windows (XLA reference path).

    Args:
      q, k, v: (nW, num_heads, N, head_dim) with N = window_size^2.
      bias: optional (num_heads, N, N) relative position bias.
    Returns:
      (nW, num_heads, N, head_dim).

    Matches WindowAttention.forward (/root/reference/models/hrformer.py:174-200):
    q is pre-scaled by head_dim^-0.5; softmax in float32.

    Precision note (measured, round 4): the f32 upcast here costs no MXU
    throughput — XLA's default matmul precision on TPU executes f32
    dot_generals as single-pass bf16 MXU ops with f32 accumulation, with
    the operand rounding fused into the matmul read.  An explicit
    "bf16 inputs + preferred_element_type=f32" variant measured 13–18%
    SLOWER at the model level (hrformer_small 127.6 vs 108.2 ms @ b128)
    because it materialized a separate probs cast for the PV matmul and
    scaled the (N, N) attention matrix instead of pre-scaling q.
    """
    head_dim = q.shape[-1]
    scale = head_dim**-0.5
    qf = q.astype(jnp.float32) * scale
    attn = jnp.einsum("whnd,whmd->whnm", qf, k.astype(jnp.float32),
                      preferred_element_type=jnp.float32)
    if bias is not None:
        attn = attn + bias.astype(jnp.float32)[None]
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("whnm,whmd->whnd", attn, v.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)

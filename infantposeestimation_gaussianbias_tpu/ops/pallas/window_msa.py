"""Pallas TPU kernel: fused window multi-head self-attention.

The XLA path (ops/msa.py) materializes the (nW, heads, N, N) attention
scores in HBM between the QK and PV matmuls — for HRFormer stage 3 at
batch 256 that is hundreds of MB of round-trip traffic per block.  This
kernel fuses scale -> QK^T -> +RPE bias -> softmax -> PV entirely in VMEM:
each grid cell owns (one head x a block of windows), the bias tile loads
once per head, and the scores never leave the chip (the kernel design from
SURVEY.md section 5.7).

Contract matches ops.msa.window_attention:
  q, k, v: (nW, num_heads, N, head_dim);  bias: (num_heads, N, N) or None
  returns  (nW, num_heads, N, head_dim)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Generic-interpreter switch for CPU tests (rationale in _interp.py).
from ._interp import InterpretSwitch

_SWITCH = InterpretSwitch()
interpret_mode = _SWITCH.mode


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale: float):
    # Blocks: q/k/v (1, GB, N, hd); bias (1, N, N).
    q = q_ref[0].astype(jnp.float32) * scale          # (GB, N, hd)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)           # (GB, N, N)
    s = s + bias_ref[0].astype(jnp.float32)[None]
    p = jax.nn.softmax(s, axis=-1)
    o = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)           # (GB, N, hd)
    out_ref[0] = o.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_windows",))
def window_attention_pallas_hm(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    block_windows: int = 16,
) -> jnp.ndarray:
    """Fused W-MSA on HEAD-MAJOR operands (H, nW, N, hd) — the layout
    WindowAttention can produce directly from its qkv projection, avoiding
    the relayout copies a window-major interface would need.

    Grid = (heads, window blocks); one head's RPE bias tile stays resident
    while its window blocks stream through VMEM."""
    H, nW, N, hd = q.shape
    if bias is None:
        bias = jnp.zeros((H, N, N), jnp.float32)

    GB = min(block_windows, max(nW, 1))
    pad = (-nW) % GB

    def arrange(x):
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return x

    qa, ka, va = arrange(q), arrange(k), arrange(v)
    nWp = nW + pad
    grid = (H, nWp // GB)

    qkv_spec = pl.BlockSpec((1, GB, N, hd), lambda h, w: (h, w, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=hd**-0.5),
        interpret=_SWITCH.enabled,
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec,
                  pl.BlockSpec((1, N, N), lambda h, w: (h, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((H, nWp, N, hd), v.dtype),
    )(qa, ka, va, bias)
    return out[:, :nW]


def window_attention_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    block_windows: int = 16,
) -> jnp.ndarray:
    """Window-major (nW, H, N, hd) interface matching ops.msa
    (relayouts to head-major around the kernel)."""
    qa, ka, va = (jnp.swapaxes(x, 0, 1) for x in (q, k, v))
    out = window_attention_pallas_hm(qa, ka, va, bias,
                                     block_windows=block_windows)
    return jnp.swapaxes(out, 0, 1)


def _auto_block(block_windows: int, nW: int, N: int, row_channels: int,
                itemsize: int = 2, budget_bytes: int = 5 * 2**20) -> int:
    """Window-block size bounded by a VMEM budget.

    Mosaic double-buffers every streamed block, so (in + out) bytes per
    block must stay well under the ~16MB scoped VMEM; row_channels is the
    total channel count moved per window row (e.g. 3C in + C out = 4C for
    the forward kernel) and itemsize the operand dtype's bytes/element
    (2 for bf16, 4 for f32 — sizing for bf16 under f32 operands would
    under-budget 2x).  At hrformer_base stage-4 (C=624) the fixed GB=32
    block hit the limit."""
    bytes_per_window = N * row_channels * itemsize
    gb = max(4, min(block_windows, budget_bytes // max(bytes_per_window, 1)))
    return min(gb, max(nW, 1))


def _pack_group(x, G: int):
    """(GB, N, hd) -> block-diagonal (GB//G, G*N, G*hd).

    Packs G independent window-attention problems into ONE MXU-shaped
    operand: group i row-block g = window i*G+g, living in its own
    hd-wide lane band.  Cross-window products then vanish structurally
    (disjoint contraction lanes), so one (G*N, G*hd)x(G*hd, G*N) matmul
    computes G window score matrices at once — at hd=32, G=4 that is a
    (196,128)@(128,196) GEMM instead of four (49,32)@(32,49) ops that
    each use ~4% of the 128x128 systolic array (round-5 decomposition,
    BENCH.md)."""
    GB, N, hd = x.shape
    ngrp = GB // G
    xr = x.reshape(ngrp, G, N, hd)
    zeros = jnp.zeros((ngrp, N, hd), x.dtype)
    rows = []
    for g in range(G):
        lane_blocks = [zeros] * G
        lane_blocks[g] = xr[:, g]
        rows.append(jnp.concatenate(lane_blocks, axis=-1))
    return jnp.concatenate(rows, axis=1)


def _unpack_group(x4, G: int, N: int, hd: int):
    """Inverse of _pack_group: extract the diagonal blocks back to
    (GB, N, hd)."""
    ngrp = x4.shape[0]
    outs = [x4[:, g * N:(g + 1) * N, g * hd:(g + 1) * hd][:, None]
            for g in range(G)]
    return jnp.concatenate(outs, axis=1).reshape(ngrp * G, N, hd)


def _attn_qkv_kernel_packed(qkv_ref, pbias_ref, out_ref, *, num_heads: int,
                            scale: float, pack: int):
    # Blocks: qkv (GB, N, 3C); pbias (H, G*N, G*N) — blockdiag RPE bias
    # with -1e30 off the diagonal blocks (masks the packed cross terms
    # out of the softmax exactly); out (GB, N, C).
    C = out_ref.shape[-1]
    hd = C // num_heads
    G = pack
    N = qkv_ref.shape[1]
    for h in range(num_heads):
        q = qkv_ref[:, :, h * hd:(h + 1) * hd].astype(jnp.float32) * scale
        k = qkv_ref[:, :, C + h * hd:C + (h + 1) * hd].astype(jnp.float32)
        v = qkv_ref[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd].astype(
            jnp.float32)
        q4, k4, v4 = _pack_group(q, G), _pack_group(k, G), _pack_group(v, G)
        s4 = jax.lax.dot_general(
            q4, k4, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # (ngrp, GN, GN)
        s4 = s4 + pbias_ref[h].astype(jnp.float32)[None]
        p4 = jax.nn.softmax(s4, axis=-1)
        o4 = jax.lax.dot_general(
            p4, v4, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # (ngrp, GN, Ghd)
        o = _unpack_group(o4, G, N, hd)
        out_ref[:, :, h * hd:(h + 1) * hd] = o.astype(out_ref.dtype)


def _packed_bias(bias: jnp.ndarray, G: int) -> jnp.ndarray:
    """(H, N, N) RPE bias -> (H, G*N, G*N) block-diagonal masked bias."""
    H, N, _ = bias.shape
    mask = jnp.kron(jnp.eye(G, dtype=jnp.float32),
                    jnp.ones((N, N), jnp.float32))
    tiled = jnp.tile(bias.astype(jnp.float32), (1, G, G))
    return jnp.where(mask.astype(bool)[None], tiled, jnp.float32(-1e30))


def _pack_factor(num_heads: int, C: int, N: int) -> int:
    """How many window problems to pack per GEMM: fill the 128-lane
    contraction (G*hd ~ 128) without growing G*N past two lane tiles."""
    hd = C // num_heads
    return max(1, min(128 // hd, 256 // N))


def _attn_qkv_kernel(qkv_ref, bias_ref, out_ref, *, num_heads: int,
                     scale: float):
    # Blocks: qkv (GB, N, 3C); bias (H, N, N); out (GB, N, C).
    C = out_ref.shape[-1]
    hd = C // num_heads
    for h in range(num_heads):
        q = qkv_ref[:, :, h * hd:(h + 1) * hd].astype(jnp.float32) * scale
        k = qkv_ref[:, :, C + h * hd:C + (h + 1) * hd].astype(jnp.float32)
        v = qkv_ref[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd].astype(
            jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (GB, N, N)
        s = s + bias_ref[h].astype(jnp.float32)[None]
        p = jax.nn.softmax(s, axis=-1)
        o = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (GB, N, hd)
        out_ref[:, :, h * hd:(h + 1) * hd] = o.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "block_windows"))
def window_attention_pallas_qkv(
    qkv: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    num_heads: int,
    block_windows: int = 32,
) -> jnp.ndarray:
    """Fused W-MSA directly on the qkv projection output — ZERO relayouts.

    Takes the (nW, N, 3C) Dense output as-is (column layout
    [q heads | k heads | v heads], head h = columns h*hd..(h+1)*hd of each
    third) and returns (nW, N, C) ready for the proj Dense.  The head-major
    variant above still forces XLA to materialize five transposed arrays at
    the pallas_call boundary; round-2 model-level measurement showed those
    copies cost more than the fusion saves (BENCH.md).  Here the kernel's
    in/out layouts ARE the model's natural layouts, so the boundary is
    copy-free; heads are a static loop inside the kernel and the lane-dim
    slices stay in VMEM.

    Args:
      qkv: (nW, N, 3C) from the qkv Dense.
      bias: (num_heads, N, N) relative position bias, or None.
      num_heads: number of attention heads (C % num_heads == 0).
    Returns:
      (nW, N, C) attention output.
    """
    nW, N, C3 = qkv.shape
    C = C3 // 3
    H = num_heads
    hd = C // H
    if bias is None:
        bias = jnp.zeros((H, N, N), jnp.float32)

    G = _pack_factor(H, C, N)
    GB = _auto_block(block_windows, nW, N, 4 * C, qkv.dtype.itemsize)
    if G > 1:
        GB = max(G, (GB // G) * G)
    pad = (-nW) % GB
    if pad:
        qkv = jnp.pad(qkv, ((0, pad), (0, 0), (0, 0)))
    nWp = nW + pad

    if G > 1:
        kernel = functools.partial(_attn_qkv_kernel_packed, num_heads=H,
                                   scale=hd**-0.5, pack=G)
        bias_in = _packed_bias(bias, G)
        bias_spec = pl.BlockSpec((H, G * N, G * N), lambda w: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        kernel = functools.partial(_attn_qkv_kernel, num_heads=H,
                                   scale=hd**-0.5)
        bias_in = bias
        bias_spec = pl.BlockSpec((H, N, N), lambda w: (0, 0, 0),
                                 memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        interpret=_SWITCH.enabled,
        grid=(nWp // GB,),
        in_specs=[
            pl.BlockSpec((GB, N, C3), lambda w: (w, 0, 0),
                         memory_space=pltpu.VMEM),
            bias_spec,
        ],
        out_specs=pl.BlockSpec((GB, N, C), lambda w: (w, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nWp, N, C), qkv.dtype),
    )(qkv, bias_in)
    return out[:nW]


def _attn_qkv_bwd_kernel(qkv_ref, bias_ref, dout_ref, dqkv_ref, dbias_ref,
                         *, num_heads: int, scale: float):
    # Blocks: qkv/dqkv (GB, N, 3C); bias/dbias (H, N, N); dout (GB, N, C).
    # Attention probs are recomputed from qkv (49-token windows fit VMEM;
    # cheaper than saving p to HBM — the flash-attention recipe at window
    # scale).  dbias accumulates across sequential grid steps.
    C = dout_ref.shape[-1]
    hd = C // num_heads

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    for h in range(num_heads):
        q = qkv_ref[:, :, h * hd:(h + 1) * hd].astype(jnp.float32)
        k = qkv_ref[:, :, C + h * hd:C + (h + 1) * hd].astype(jnp.float32)
        v = qkv_ref[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd].astype(
            jnp.float32)
        do = dout_ref[:, :, h * hd:(h + 1) * hd].astype(jnp.float32)

        s = scale * jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (GB, N, N)
        s = s + bias_ref[h].astype(jnp.float32)[None]
        p = jax.nn.softmax(s, axis=-1)

        dv = jax.lax.dot_general(                     # p^T do
            p, do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (GB, N, hd)
        dp = jax.lax.dot_general(                     # do v^T
            do, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (GB, N, N)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dbias_ref[h] += jnp.sum(ds, axis=0).astype(dbias_ref.dtype)
        dq = scale * jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (GB, N, hd)
        dk = scale * jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (GB, N, hd)

        dt = dqkv_ref.dtype
        dqkv_ref[:, :, h * hd:(h + 1) * hd] = dq.astype(dt)
        dqkv_ref[:, :, C + h * hd:C + (h + 1) * hd] = dk.astype(dt)
        dqkv_ref[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd] = dv.astype(dt)


def _attn_qkv_bwd_kernel_packed(qkv_ref, pbias_ref, dout_ref, dqkv_ref,
                                dbias_ref, *, num_heads: int, scale: float,
                                pack: int):
    # Packed-GEMM backward: recompute probs with the same block-diagonal
    # packing as the forward, then run the five attention-backward
    # matmuls at MXU shape.  All packed intermediates are block-diagonal
    # (cross blocks: p4 ~ exp(-1e30) = 0 and do4/v4 structurally 0), so
    # the softmax-backward row reduction and dbias extraction are exact.
    C = dout_ref.shape[-1]
    hd = C // num_heads
    G = pack
    N = dout_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    for h in range(num_heads):
        q = qkv_ref[:, :, h * hd:(h + 1) * hd].astype(jnp.float32)
        k = qkv_ref[:, :, C + h * hd:C + (h + 1) * hd].astype(jnp.float32)
        v = qkv_ref[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd].astype(
            jnp.float32)
        do = dout_ref[:, :, h * hd:(h + 1) * hd].astype(jnp.float32)
        q4, k4, v4, do4 = (_pack_group(t, G) for t in (q, k, v, do))

        s4 = scale * jax.lax.dot_general(
            q4, k4, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        s4 = s4 + pbias_ref[h].astype(jnp.float32)[None]
        p4 = jax.nn.softmax(s4, axis=-1)

        dv4 = jax.lax.dot_general(                    # p^T do
            p4, do4, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (ngrp, GN, Ghd)
        dp4 = jax.lax.dot_general(                    # do v^T
            do4, v4, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (ngrp, GN, GN)
        ds4 = p4 * (dp4 - jnp.sum(dp4 * p4, axis=-1, keepdims=True))
        # dbias: sum the G diagonal (N, N) blocks over groups and grid
        db = jnp.zeros((N, N), jnp.float32)
        for g in range(G):
            db = db + jnp.sum(
                ds4[:, g * N:(g + 1) * N, g * N:(g + 1) * N], axis=0)
        dbias_ref[h] += db.astype(dbias_ref.dtype)
        dq4 = scale * jax.lax.dot_general(
            ds4, k4, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dk4 = scale * jax.lax.dot_general(
            ds4, q4, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

        dt = dqkv_ref.dtype
        dq = _unpack_group(dq4, G, N, hd)
        dk = _unpack_group(dk4, G, N, hd)
        dv = _unpack_group(dv4, G, N, hd)
        dqkv_ref[:, :, h * hd:(h + 1) * hd] = dq.astype(dt)
        dqkv_ref[:, :, C + h * hd:C + (h + 1) * hd] = dk.astype(dt)
        dqkv_ref[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd] = dv.astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def window_attention_pallas_qkv_vjp(
    qkv: jnp.ndarray,
    bias: jnp.ndarray,
    num_heads: int,
    block_windows: int = 32,
) -> jnp.ndarray:
    """Differentiable fused W-MSA on the flat qkv layout.

    Same contract as window_attention_pallas_qkv but with a Pallas
    backward kernel (recompute-probs, accumulated dbias), so HRFormer
    TRAINING can use the fused path too.  bias is required (HRFormer
    always trains with RPE)."""
    return window_attention_pallas_qkv(qkv, bias, num_heads,
                                       block_windows=block_windows)


def _qkv_vjp_fwd(qkv, bias, num_heads, block_windows):
    out = window_attention_pallas_qkv(qkv, bias, num_heads,
                                      block_windows=block_windows)
    return out, (qkv, bias)


def _qkv_vjp_bwd(num_heads, block_windows, res, dout):
    qkv, bias = res
    nW, N, C3 = qkv.shape
    C = C3 // 3
    H = num_heads
    hd = C // H

    G = _pack_factor(H, C, N)
    GB = _auto_block(min(16, block_windows), nW, N, 7 * C,
                     qkv.dtype.itemsize)
    if G > 1:
        GB = max(G, (GB // G) * G)
    pad = (-nW) % GB
    if pad:
        # zero-padded windows produce ds == 0 (dp == 0), so they pollute
        # neither dbias nor dqkv
        qkv = jnp.pad(qkv, ((0, pad), (0, 0), (0, 0)))
        dout = jnp.pad(dout, ((0, pad), (0, 0), (0, 0)))
    nWp = nW + pad

    if G > 1:
        kernel = functools.partial(_attn_qkv_bwd_kernel_packed,
                                   num_heads=H, scale=hd**-0.5, pack=G)
        bias_in = _packed_bias(bias, G)
        bias_spec = pl.BlockSpec((H, G * N, G * N), lambda w: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        kernel = functools.partial(_attn_qkv_bwd_kernel, num_heads=H,
                                   scale=hd**-0.5)
        bias_in = bias
        bias_spec = pl.BlockSpec((H, N, N), lambda w: (0, 0, 0),
                                 memory_space=pltpu.VMEM)

    dqkv, dbias = pl.pallas_call(
        kernel,
        interpret=_SWITCH.enabled,
        grid=(nWp // GB,),
        in_specs=[
            pl.BlockSpec((GB, N, C3), lambda w: (w, 0, 0),
                         memory_space=pltpu.VMEM),
            bias_spec,
            pl.BlockSpec((GB, N, C), lambda w: (w, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((GB, N, C3), lambda w: (w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, N, N), lambda w: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nWp, N, C3), qkv.dtype),
            jax.ShapeDtypeStruct((H, N, N), jnp.float32),
        ],
    )(qkv, bias_in, dout)
    return dqkv[:nW], dbias.astype(bias.dtype)


window_attention_pallas_qkv_vjp.defvjp(_qkv_vjp_fwd, _qkv_vjp_bwd)


def window_attention_pallas_qkv_sharded(
    qkv: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    num_heads: int,
    mesh,
    block_windows: int = 32,
    differentiable: bool = True,
) -> jnp.ndarray:
    """Mesh-composed fused W-MSA: the Pallas kernel under ``shard_map``.

    ``pallas_call`` has no GSPMD partitioning rules, so calling the plain
    kernel inside a pjit over a mesh forces its operands to replicate.
    This wrapper makes the kernel and the ('data', 'model') mesh compose:

    * windows shard over 'data' (they are independent — the spatial
      analogue of sequence parallelism, SURVEY.md section 5.7), with nW
      zero-padded up to a multiple of the axis size; and
    * heads shard over 'model' when num_heads divides evenly
      (head-parallel attention: the flat [q|k|v] thirds each split into
      contiguous per-head column groups, so feature sharding of the
      (nW, N, 3, C) view IS head sharding), with the RPE bias sharded on
      its head axis; otherwise the model axis replicates.

    Autodiff flows through shard_map: dqkv keeps the input specs and the
    bias cotangent is psum-reduced over 'data' by shard_map's transpose,
    matching the unsharded kernel's dbias accumulation.

    Args match window_attention_pallas_qkv(_vjp) plus:
      mesh: a jax.sharding.Mesh with 'data' (and optionally 'model') axes.
      differentiable: use the custom-VJP kernel (requires bias, like the
        unsharded variant); False = forward-only kernel.
    Returns (nW, N, C) sharded over ('data', None, 'model'-or-replicated).
    """
    from jax.sharding import PartitionSpec as P

    nW, N, C3 = qkv.shape
    C = C3 // 3
    H = num_heads

    d = mesh.shape.get("data", 1)
    m = mesh.shape.get("model", 1)
    head_parallel = m > 1 and H % m == 0

    if bias is None:
        if differentiable:
            raise ValueError("differentiable sharded W-MSA requires bias "
                             "(same contract as the unsharded VJP kernel)")
        bias = jnp.zeros((H, N, N), jnp.float32)

    pad = (-nW) % d
    if pad:
        # zero windows attend over zeros -> zero outputs/grads; cropped off
        qkv = jnp.pad(qkv, ((0, pad), (0, 0), (0, 0)))
    nWp = nW + pad

    # (nW, N, 3C) -> (nW, N, 3, C): row-major split keeps the [q|k|v]
    # thirds on the new axis, putting heads contiguous on the last axis.
    qkv4 = qkv.reshape(nWp, N, 3, C)
    model_ax = "model" if head_parallel else None
    h_local = H // m if head_parallel else H

    def body(qkv4_l, bias_l):
        nWl, _, _, Cl = qkv4_l.shape
        qkv_l = qkv4_l.reshape(nWl, N, 3 * Cl)
        if differentiable:
            return window_attention_pallas_qkv_vjp(
                qkv_l, bias_l, h_local, block_windows)
        return window_attention_pallas_qkv(
            qkv_l, bias_l, h_local, block_windows=block_windows)

    out = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("data", None, None, model_ax), P(model_ax, None, None)),
        out_specs=P("data", None, model_ax),
        check_vma=False,
    )(qkv4, bias)
    return out[:nW]

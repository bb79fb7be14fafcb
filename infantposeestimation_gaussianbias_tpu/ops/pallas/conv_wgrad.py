"""Pallas TPU kernel: 3x3 stride-1 conv weight gradient, wide-lane.

The training backward's overhang is the weight gradient of the HRNet
branch convs (tools/probe_wgrad.py, v5e b128): XLA emits dW with the
co output channels on the MXU lane dimension — co=32 uses a quarter of
the 128 lanes, making dW cost ~2x the forward conv (0.191 ms vs 0.095
ms at the 64x48xC32 branch shape).  Reorienting to the wide matmul

    dW[ci, (dh*3+dw)*Co + co] = sum_{b,h,w} x[b,h,w,ci]
                                * dy[b, h-dh+1, w-dw+1, co]
    (i.e.  dW2 = x2d^T @ dy_shifts,  N = 9*Co lanes)

is a loss in pure XLA because the (rows, 9*Co) shifted-dy operand
round-trips HBM (dw_t/dw_tap rows of the probe: 25-50x slower).  Here
the nine shifted views are built IN VMEM per batch-block and consumed
immediately by one dot_general, so HBM traffic is one read each of x
and (padded) dy — the kernel is then MXU-bound at >=75% lane
utilization for Co>=32.

Contract: x (B,H,W,Ci), dy (B,H,W,Co) -> dW (3,3,Ci,Co) float32,
equal to jax.vjp of lax.conv_general_dilated(NHWC, SAME, stride 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Generic-interpreter switch for CPU tests (rationale in _interp.py).
from ._interp import InterpretSwitch

_SWITCH = InterpretSwitch()
interpret_mode = _SWITCH.mode


def _wgrad_kernel(x_ref, dy_ref, out_ref, sh_ref, *, H: int, W: int,
                  margin: int):
    # Blocks: x/dy (bb, H+2, W+2, C) BOTH zero-padded spatially;
    # out (3*Ci, 3*Co) f32 accumulated across grid steps; sh scratch
    # (margin + R + margin, 3*Co) with R = bb*(H+2)*(W+2).
    #
    # The whole trick: in the FLATTENED padded row space, every tap
    # shift (dh, dw) is a pure row offset s = (dh-1)*(W+2) + (dw-1),
    # and the zero pad rows/columns absorb all cross-boundary products.
    # So the dy side needs only THREE stores (the dw in {0,1,2} views,
    # row offsets -1/0/+1, stacked on lanes as 3*Co groups), and the
    # three dh shifts are free offset WINDOWS into the scratch — no
    # lane realignment anywhere (the v1 kernel's 9 spatially-sliced
    # stores were 3-7x slower than XLA from exactly that realignment).
    bb = x_ref.shape[0]
    Ci = x_ref.shape[-1]
    Co = dy_ref.shape[-1]
    R = bb * (H + 2) * (W + 2)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)
        # margin rows stay zero forever; the per-step stores cover
        # exactly rows [margin-1, margin+1+R)
        sh_ref[...] = jnp.zeros_like(sh_ref)

    x2 = x_ref[...].reshape(R, Ci)
    dy2 = dy_ref[...].reshape(R, Co)
    for dw in range(3):
        start = margin + (dw - 1)
        sh_ref[start:start + R, dw * Co:(dw + 1) * Co] = dy2
    for dh in range(3):
        start = margin - (dh - 1) * (W + 2)
        win = sh_ref[start:start + R, :]
        acc = jax.lax.dot_general(
            x2, win, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (Ci, 3*Co)
        out_ref[dh * Ci:(dh + 1) * Ci, :] += acc


def _batch_block(B: int, H: int, W: int, Ci: int, Co: int,
                 itemsize: int, budget_bytes: int = 2 * 2**20) -> int:
    """Largest batch block whose padded x/dy + 3-lane-group scratch fit
    the VMEM budget (Mosaic double-buffers the streamed inputs), chosen
    to divide B."""
    hp, wp = H + 2, W + 2
    per_sample = (hp * wp * Ci                 # padded x block
                  + hp * wp * Co               # padded dy block
                  + hp * wp * 3 * Co) * itemsize  # scratch share
    bb = max(1, budget_bytes // max(per_sample, 1))
    while B % bb:
        bb -= 1
    return bb


@jax.jit
def conv3x3_wgrad(x: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """Weight grad of a SAME stride-1 3x3 NHWC conv: (3, 3, Ci, Co) f32."""
    B, H, W, Ci = x.shape
    Co = dy.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dyp = jnp.pad(dy, ((0, 0), (1, 1), (1, 1), (0, 0)))

    bb = _batch_block(B, H, W, Ci, Co, x.dtype.itemsize)
    margin = W + 3
    R = bb * (H + 2) * (W + 2)
    out = pl.pallas_call(
        functools.partial(_wgrad_kernel, H=H, W=W, margin=margin),
        interpret=_SWITCH.enabled,
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((bb, H + 2, W + 2, Ci), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, H + 2, W + 2, Co), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3 * Ci, 3 * Co), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3 * Ci, 3 * Co), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R + 2 * margin, 3 * Co), x.dtype)],
    )(xp, dyp)
    # out[dh*Ci + ci, dw*Co + co] -> (3, 3, Ci, Co)
    return out.reshape(3, Ci, 3, Co).transpose(0, 2, 1, 3)

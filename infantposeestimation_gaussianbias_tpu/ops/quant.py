"""Post-training int8 quantization (PTQ) for TPU serving.

The v5e MXU runs int8 at ~2x its bf16 rate (394 TOPS vs 197 TFLOP/s;
tools/probe_conv.py measures 229-371 TOP/s on the HRNet branch-conv
shapes vs 108-239 TFLOP/s bf16), and int8 activations halve the HBM
traffic that bounds the small-channel layers.  This module provides the
serving-side quantization toolbox used by the model zoo's ``quant`` mode:

* ``QTensor`` — an int8 tensor + its (runtime scalar) dequantization
  scale.  Activations flow between layers in this form, so a producer
  quantizes ONCE and every consumer folds ``in_scale`` into its own
  epilogue as a scalar multiply.
* weight quantization — per-output-channel symmetric int8.
* BatchNorm folding — inference BN is a per-channel affine (a, b); it
  folds into the conv epilogue:
      y = conv_i32(x_q, w_q) * (in_s * w_s * a) + b
  One XLA fusion per conv: int32 in, f32 math, int8 (or bf16) out.
* calibration — the float model ``sow``s running abs-max of every tensor
  that will be quantized (see layers.py ``calibrate`` mode); scales are
  ``absmax / 127``.
* ``convert_tree`` — walks the float params/batch_stats/calib trees and
  emits the mirrored ``qparams`` tree the quantized forward consumes.

The reference has no quantized path (its "FP16 mixed precision" tip,
/root/reference/README.md:236, is the closest analogue); this is a
TPU-native capability on top of reference parity.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

INT8_MAX = 127.0


class QTensor(NamedTuple):
    """int8 data + scalar dequantization scale (x ~= data * scale)."""

    data: jnp.ndarray   # int8
    scale: jnp.ndarray  # () float32

    @property
    def shape(self):
        return self.data.shape

    def dequantize(self, dtype=jnp.float32) -> jnp.ndarray:
        return self.data.astype(dtype) * self.scale.astype(dtype)


def quantize_act(x: jnp.ndarray, absmax: jnp.ndarray) -> QTensor:
    """Per-tensor symmetric int8 quantization with scale absmax/127."""
    scale = jnp.maximum(jnp.asarray(absmax, jnp.float32), 1e-12) / INT8_MAX
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -INT8_MAX,
                 INT8_MAX).astype(jnp.int8)
    return QTensor(q, scale)


def quantize_weight(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Per-output-channel symmetric int8 weights.

    ``w`` is HWIO (conv) or IO (dense); the output channel is the last
    axis.  Returns {"w_int8", "w_scale"(O,)}.
    """
    wf = jnp.asarray(w, jnp.float32)
    axes = tuple(range(wf.ndim - 1))
    absmax = jnp.maximum(jnp.max(jnp.abs(wf), axis=axes), 1e-12)
    scale = absmax / INT8_MAX
    q = jnp.clip(jnp.round(wf / scale), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return {"w_int8": q, "w_scale": scale}


def fold_batchnorm(scale: jnp.ndarray, bias: jnp.ndarray, mean: jnp.ndarray,
                   var: jnp.ndarray, epsilon: float = 1e-5):
    """Inference BN -> per-channel affine (a, b): bn(x) = x*a + b.

    Matches layers.BatchNorm's inference math exactly (f32)."""
    a = scale * jax.lax.rsqrt(var + epsilon)
    b = bias - mean * a
    return a, b


def qconv(x: QTensor, w_int8: jnp.ndarray, strides=(1, 1),
          padding: Any = "SAME") -> jnp.ndarray:
    """int8 NHWC conv with int32 accumulation; returns raw int32."""
    dn = jax.lax.conv_dimension_numbers(x.data.shape, w_int8.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x.data, w_int8, strides, padding, dimension_numbers=dn,
        preferred_element_type=jnp.int32)


def qconv_affine(x: QTensor, q: Dict[str, jnp.ndarray], strides=(1, 1),
                 padding: Any = "SAME") -> jnp.ndarray:
    """Quantized conv + dequant + folded-BN affine -> f32 (pre-activation).

    ``q`` holds w_int8 (HWIO), eff_scale (O,) = w_scale * bn_a and
    eff_bias (O,) = bn_b (pure conv: eff_scale = w_scale, eff_bias = bias
    or 0).  The in_scale multiply is a runtime scalar so producers and
    consumers need no scale agreement.
    """
    acc = qconv(x, q["w_int8"], strides, padding)
    return (acc.astype(jnp.float32) * (x.scale * q["eff_scale"])
            + q["eff_bias"])


def qdense(x: jnp.ndarray, q: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Quantized Dense on a float input: per-tensor int8 input quantization
    (calibrated static scale) -> int8 x int8 -> int32 matmul on the MXU ->
    f32 dequant + bias epilogue.

    Unlike the conv path (which chains int8 activations through whole
    blocks), transformer Dense layers sit between float LayerNorms, so
    each qdense quantizes its own input and returns f32.  ``q`` holds
    w_int8 (I, O), w_scale (O,), bias (O,), in_scale ().
    """
    inv = 1.0 / q["in_scale"]
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -INT8_MAX,
                  INT8_MAX).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, q["w_int8"], (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * (q["in_scale"] * q["w_scale"])
            + q["bias"])


def convert_dense(params: Dict, in_absmax: jnp.ndarray
                  ) -> Dict[str, jnp.ndarray]:
    """One Dense {kernel (I,O), bias} + its calibrated input abs-max
    -> the qparams qdense consumes."""
    qw = quantize_weight(params["kernel"])
    bias = params.get("bias")
    if bias is None:
        bias = jnp.zeros((params["kernel"].shape[-1],), jnp.float32)
    return {
        "w_int8": qw["w_int8"],
        "w_scale": qw["w_scale"],
        "bias": jnp.asarray(bias, jnp.float32),
        "in_scale": (jnp.maximum(jnp.asarray(in_absmax, jnp.float32), 1e-12)
                     / INT8_MAX),
    }


def requantize(y: jnp.ndarray, out_scale: jnp.ndarray) -> QTensor:
    """f32 -> int8 with a calibrated static scale (scalar reciprocal is
    hoisted so the per-element op is a multiply, not a divide)."""
    scale = jnp.asarray(out_scale, jnp.float32)
    inv = 1.0 / scale
    q = jnp.clip(jnp.round(y * inv), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return QTensor(q, scale)


# ---------------------------------------------------------------------------
# Conversion: float params + batch_stats + calib -> qparams tree
# ---------------------------------------------------------------------------

def _is_convnorm(node: Dict) -> bool:
    return isinstance(node, dict) and "conv" in node and "norm" in node \
        and isinstance(node["conv"], dict) and "kernel" in node["conv"]


def convert_convnorm(params: Dict, stats: Optional[Dict],
                     out_absmax: Optional[jnp.ndarray],
                     epsilon: float = 1e-5) -> Dict[str, jnp.ndarray]:
    """One ConvNorm {conv/kernel, norm/bn/{scale,bias}} (+ batch_stats)
    -> {w_int8, eff_scale, eff_bias[, out_scale]}."""
    qw = quantize_weight(params["conv"]["kernel"])
    if "bn" in params.get("norm", {}):
        bn_p = params["norm"]["bn"]
        bn_s = stats["norm"]["bn"]
        a, b = fold_batchnorm(bn_p["scale"], bn_p["bias"],
                              bn_s["mean"], bn_s["var"], epsilon)
    else:  # groupnorm is data-dependent and cannot fold; caller must gate
        raise ValueError("quantization requires batchnorm ConvNorms")
    out = {"w_int8": qw["w_int8"],
           "eff_scale": qw["w_scale"] * a,
           "eff_bias": jnp.asarray(b, jnp.float32)}
    if out_absmax is not None:
        out["out_scale"] = (jnp.maximum(jnp.asarray(out_absmax, jnp.float32),
                                        1e-12) / INT8_MAX)
    return out


def _calib_value(calib_node) -> Optional[jnp.ndarray]:
    """calib entries are sow-ed as 1-tuples (or arrays)."""
    if calib_node is None:
        return None
    if isinstance(calib_node, (tuple, list)):
        return calib_node[0] if calib_node else None
    return calib_node


def convert_tree(params: Dict, batch_stats: Optional[Dict],
                 calib: Dict) -> Dict:
    """Mirror the model tree: every ConvNorm subtree becomes its qparams.

    Non-ConvNorm dict nodes recurse; calibration scalars recorded at a
    module level (block/module requant points, e.g. ``out_absmax``)
    become ``*_scale`` leaves at the same path.  Leaves that are neither
    are dropped (the quantized forward reads float finals from the
    regular params tree).
    """
    out: Dict = {}
    for key, node in params.items():
        stats_node = (batch_stats or {}).get(key)
        calib_node = (calib or {}).get(key)
        # Dense layer whose input range was calibrated by its parent
        # module (transformer qkv/proj/fc1/fc2 — see hrformer.py):
        # the sow point lives beside the Dense node as <name>_in_absmax.
        dense_absmax = _calib_value((calib or {}).get(f"{key}_in_absmax"))
        if (dense_absmax is not None and isinstance(node, dict)
                and "kernel" in node
                and getattr(node["kernel"], "ndim", 0) == 2):
            out[key] = convert_dense(node, dense_absmax)
        elif _is_convnorm(node):
            absmax = None
            if isinstance(calib_node, dict):
                absmax = _calib_value(calib_node.get("out_absmax"))
            out[key] = convert_convnorm(node, stats_node, absmax)
        elif isinstance(node, dict):
            sub = convert_tree(node, stats_node, calib_node
                               if isinstance(calib_node, dict) else {})
            if sub:
                out[key] = sub
    # module-level calibration points with no params twin (requant scales)
    for key, node in (calib or {}).items():
        if key in out or key.endswith("_in_absmax"):
            continue  # _in_absmax entries were folded into their Dense
        val = _calib_value(node if not isinstance(node, dict) else None)
        if val is None and isinstance(node, dict):
            continue
        if val is not None and key.endswith("_absmax"):
            out[key.replace("_absmax", "_scale")] = (
                jnp.maximum(jnp.asarray(val, jnp.float32), 1e-12) / INT8_MAX)
    return out


def calibrate_model(apply_fn, variables: Dict, batches) -> Dict:
    """Run the float model in calibrate mode over ``batches`` and return
    the accumulated calib collection (running abs-max per sow point).

    ``apply_fn(variables, batch)`` must call the model with
    ``mutable=["calib"]`` and return ``(outputs, mutated)``.
    """
    calib: Dict = {}
    for batch in batches:
        vars_in = dict(variables)
        if calib:
            vars_in["calib"] = calib
        _, mutated = apply_fn(vars_in, batch)
        calib = mutated["calib"]
    return jax.tree_util.tree_map(lambda x: x, calib)

"""Model-level int8 PTQ driver: calibrate -> convert -> serve.

Builds on ops/quant.py.  Typical serving flow:

    model   = build_model(cfg)                      # float, trained
    qvars   = quantize_model(cfg, variables, calibration_batches)
    qmodel  = build_model(cfg, quant=True)
    outputs = qmodel.apply(qvars, images, False)    # int8 MXU path

The calibration batches should be real (augment-free) crops so the
per-tensor abs-max ranges match deployment inputs; a handful of batches
is enough because every range is a running max.
"""

from __future__ import annotations

from typing import Dict, Iterable

import jax

from ..ops.quant import convert_tree
from .pose_estimator import build_model


def calibrate(cfg, variables: Dict, batches: Iterable) -> Dict:
    """Run the float model in calibrate mode over ``batches`` and return
    the calib tree of running abs-max values."""
    model = build_model(cfg, calibrate=True)

    @jax.jit
    def step(vars_in, batch):
        _, mutated = model.apply(vars_in, batch, False, mutable=["calib"])
        return mutated["calib"]

    calib: Dict = {}
    for batch in batches:
        vars_in = dict(variables)
        if calib:
            vars_in["calib"] = calib
        calib = step(vars_in, batch)
    if not calib:
        raise ValueError("calibration needs at least one batch")
    return calib


def strip_float_params(params: Dict, head_type: str) -> Dict:
    """Keep only the float leaves the quantized forward still reads
    (head finals + learnable decode scalars); the backbone runs entirely
    from qparams, so shipping its float weights to the device would waste
    HBM and transfer time."""
    if head_type == "fusion":
        head = params["head"]
        kept = {k: head[k] for k in ("hm_final", "off_final", "var_final",
                                     "fusion_weight", "subpixel_alpha")}
        return {"head": kept}
    if head_type == "heatmap":
        return {"head": params["head"]}
    raise ValueError(f"unsupported head for PTQ: {head_type!r}")


def strip_quantized_dense(params: Dict, qparams: Dict) -> Dict:
    """Drop every float Dense whose qparams twin carries the int8 weights
    (transformer PTQ: only those Dense nodes move to qparams; everything
    else — convs, norms, head — still serves from the float tree)."""
    out: Dict = {}
    for key, node in params.items():
        qnode = qparams.get(key) if isinstance(qparams, dict) else None
        if isinstance(node, dict):
            if isinstance(qnode, dict) and "in_scale" in qnode:
                continue  # replaced by qdense
            sub = strip_quantized_dense(node, qnode or {})
            if sub:
                out[key] = sub
        else:
            out[key] = node
    return out


def _prune_non_dense_qparams(qparams: Dict) -> Dict:
    """Dense-PTQ mode only reads qdense nodes (those with in_scale);
    convert_tree also emitted conv qparams for the float conv trunk —
    drop them so they don't ship to the device."""
    out: Dict = {}
    for key, node in qparams.items():
        if isinstance(node, dict):
            if "in_scale" in node:
                out[key] = node
            elif "w_int8" in node or "eff_scale" in node:
                continue
            else:
                sub = _prune_non_dense_qparams(node)
                if sub:
                    out[key] = sub
    return out


def quantize_model(cfg, variables: Dict, batches: Iterable,
                   strip: bool = True) -> Dict:
    """Float variables + calibration data -> variables for the quant model.

    Returns {"params": <float leaves still needed>, "qparams": <int8
    weights + fused BN affines + requant scales>} (plus batch_stats when
    the quant forward still runs float BatchNorms: heatmap-head deconvs,
    and the whole conv trunk of the hrformer Dense-PTQ mode).
    """
    calib = calibrate(cfg, variables, batches)
    qparams = convert_tree(variables["params"],
                           variables.get("batch_stats"), calib)
    if cfg.model.backbone.startswith("hrformer"):
        # Dense-only PTQ: keep the float tree minus the quantized Dense
        # nodes; conv trunk still needs its BatchNorm statistics.
        qparams = _prune_non_dense_qparams(qparams)
        params = (strip_quantized_dense(variables["params"], qparams)
                  if strip else variables["params"])
        out = {"params": params, "qparams": qparams}
        if "batch_stats" in variables:
            out["batch_stats"] = variables["batch_stats"]
        return out
    params = (strip_float_params(variables["params"], cfg.model.head_type)
              if strip else variables["params"])
    out = {"params": params, "qparams": qparams}
    if cfg.model.head_type == "heatmap" and "batch_stats" in variables:
        stats = variables["batch_stats"].get("head")
        if stats:
            out["batch_stats"] = {"head": stats}
    return out

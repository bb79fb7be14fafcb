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


def quantize_model(cfg, variables: Dict, batches: Iterable,
                   strip: bool = True) -> Dict:
    """Float variables + calibration data -> variables for the quant model.

    Returns {"params": <float leaves still needed>, "qparams": <int8
    weights + fused BN affines + requant scales>} (plus batch_stats when
    the head still uses BatchNorm, i.e. heatmap heads with deconvs).
    """
    calib = calibrate(cfg, variables, batches)
    qparams = convert_tree(variables["params"],
                           variables.get("batch_stats"), calib)
    params = (strip_float_params(variables["params"], cfg.model.head_type)
              if strip else variables["params"])
    out = {"params": params, "qparams": qparams}
    if cfg.model.head_type == "heatmap" and "batch_stats" in variables:
        stats = variables["batch_stats"].get("head")
        if stats:
            out["batch_stats"] = {"head": stats}
    return out

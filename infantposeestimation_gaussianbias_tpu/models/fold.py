"""BN-fold float serving: bake inference BatchNorm into conv weights.

At inference BatchNorm is a static per-channel affine (a, b), so

    norm(conv(x, W)) = conv(x, W * a) + b

exactly (ops/quant.py fold_batchnorm gives the same (a, b) the custom
BatchNorm applies).  Folding removes the separate norm op from the
serving graph — which matters far beyond the multiply it saves: on TPU
the stand-alone BN between the strided stem convs forces XLA into
layout/fusion overhead worth ~16 ms at batch 256 (BENCH.md stem probe:
two stem convs run 1.8 ms without BN vs 18 ms with).  The int8 path
already folds structurally; this gives the bf16/f32 path the same shape.

Serving flow:

    model  = build_model(cfg)                       # float, trained
    fvars  = fold_variables(variables)              # fold ConvNorm BNs
    fmodel = build_model(cfg, fold=True)
    out    = fmodel.apply(fvars, images, False)

Only ConvNorm subtrees with BatchNorm fold; any other norm (GroupNorm,
LayerNorm, head deconv BNs) keeps running from the untouched remainder
of the tree, so ``batch_stats`` is passed through.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..ops.quant import _is_convnorm, fold_batchnorm


def _foldable(node, stats_node) -> bool:
    return (_is_convnorm(node) and isinstance(stats_node, dict)
            and "bn" in node.get("norm", {})
            and "bn" in (stats_node.get("norm") or {}))


def _fold_convnorm(node: Dict, stats_node: Dict) -> Dict:
    bn_p = node["norm"]["bn"]
    bn_s = stats_node["norm"]["bn"]
    a, b = fold_batchnorm(bn_p["scale"], bn_p["bias"],
                          bn_s["mean"], bn_s["var"])
    kernel = jnp.asarray(node["conv"]["kernel"], jnp.float32)
    return {"conv": {
        "kernel": kernel * a,          # (H, W, I, O) * (O,)
        "bias": jnp.asarray(b, jnp.float32),
    }}


def _fold_walk(params: Dict, stats: Dict) -> Dict:
    if _foldable(params, stats):  # bare ConvNorm module
        return _fold_convnorm(params, stats)
    out: Dict = {}
    for key, node in params.items():
        stats_node = (stats or {}).get(key)
        if _foldable(node, stats_node):
            out[key] = _fold_convnorm(node, stats_node)
        elif isinstance(node, dict):
            out[key] = _fold_walk(node, stats_node
                                  if isinstance(stats_node, dict) else {})
        else:
            out[key] = node
    return out


def fold_variables(variables: Dict) -> Dict:
    """Float variables -> variables for ``build_model(cfg, fold=True)``.

    batch_stats passes through for any norm that did not fold (e.g. the
    heatmap head's deconv BNs); folded ConvNorms simply stop reading it.
    """
    params = _fold_walk(variables["params"],
                        variables.get("batch_stats") or {})
    out = {"params": params}
    if "batch_stats" in variables:
        out["batch_stats"] = variables["batch_stats"]
    return out

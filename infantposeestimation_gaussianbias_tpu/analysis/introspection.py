"""Model introspection & quantitative analysis.

JAX rebuild of the reference's hook-based analysis suites
(/root/reference/analysis/nn_quantitative_viz.py and
/root/reference/analysis/advanced_analysis.py): parameter counting
(total + per-layer), activation statistics + dead-ReLU detection
(via flax capture_intermediates instead of torch hooks), PCK accuracy,
error distributions, confidence calibration, input-gradient saliency,
occlusion sensitivity, Grad-CAM on backbone features, and MC-dropout
(DropPath) uncertainty.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp


# -- parameters (ref nn_quantitative_viz.py:545-600) -----------------------

def count_parameters(params) -> int:
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(params))


def per_layer_parameters(params) -> Dict[str, int]:
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    out: Dict[str, int] = {}
    for path, value in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        out[name] = int(np.prod(value.shape))
    return out


def parameter_summary(params, top: int = 20) -> str:
    per = per_layer_parameters(params)
    total = sum(per.values())
    lines = [f"total parameters: {total / 1e6:.2f}M ({total:,})"]
    for name, n in sorted(per.items(), key=lambda kv: -kv[1])[:top]:
        lines.append(f"  {n / 1e6:7.3f}M  {name}")
    return "\n".join(lines)


# -- weights (ref advanced_analysis.py:153-312, WeightAnalyzer) -------------

def weight_statistics(params, sparsity_levels=(1e-6, 1e-5, 1e-4, 1e-3,
                                               1e-2, 1e-1)) -> Dict:
    """Weight-distribution statistics: overall mean/std, per-layer
    mean/std (matmul/conv kernels, the reference's 'weight' filter),
    sparsity ratios at log-spaced thresholds, and normal-Q-Q sample pairs
    (theoretical vs ordered sample quantiles, scipy.stats.probplot
    semantics)."""
    from scipy import stats as sstats

    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    per_layer = {}
    chunks = []
    for path, value in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if not name.endswith("kernel"):
            continue
        w = np.asarray(value, np.float64).ravel()
        per_layer[name] = {"mean": float(w.mean()), "std": float(w.std()),
                           "min": float(w.min()), "max": float(w.max()),
                           "n": int(w.size)}
        chunks.append(w)
    allw = (np.concatenate(chunks) if chunks else np.zeros(1))
    sample = np.sort(allw[:: max(1, len(allw) // 10_000)])
    osm, osr = sstats.probplot(sample, dist="norm", fit=False)
    slope, intercept, r = sstats.linregress(osm, osr)[:3]
    return {
        "overall": {"mean": float(allw.mean()), "std": float(allw.std()),
                    "n": int(allw.size)},
        "per_layer": per_layer,
        "sparsity": {float(t): float((np.abs(allw) < t).mean())
                     for t in sparsity_levels},
        "qq": {"theoretical": osm, "ordered": osr,
               "slope": float(slope), "intercept": float(intercept),
               "r": float(r)},
    }


def gradient_statistics(grads) -> Dict[str, Dict]:
    """Per-parameter gradient mean/std/min/max/norm
    (ref advanced_analysis.py:249-312, analyze_gradient_statistics)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(grads)
    out = {}
    for path, value in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        g = np.asarray(value, np.float64).ravel()
        out[name] = {"mean": float(g.mean()), "std": float(g.std()),
                     "min": float(g.min()), "max": float(g.max()),
                     "norm": float(np.linalg.norm(g))}
    return out


# -- activations (ref advanced_analysis.py:15-151) --------------------------

def capture_activations(model, variables, x,
                        filter_fn: Optional[Callable] = None
                        ) -> Dict[str, np.ndarray]:
    """Record every module output via flax capture_intermediates —
    the JAX equivalent of the reference's forward hooks."""
    _, state = model.apply(variables, x, False,
                           capture_intermediates=filter_fn or True,
                           mutable=["intermediates"])

    flat, _ = jax.tree_util.tree_flatten_with_path(state["intermediates"])
    out = {}
    for path, value in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        out[name.replace("/__call__/0", "")] = np.asarray(value)
    return out


def activation_statistics(acts: Dict[str, np.ndarray]) -> Dict[str, Dict]:
    """Mean/std/sparsity per captured activation; 'dead' fraction is the
    share of channels that never activate (ReLU outputs only)."""
    stats = {}
    for name, a in acts.items():
        a = np.asarray(a, np.float32)
        entry = {
            "mean": float(a.mean()),
            "std": float(a.std()),
            "sparsity": float((a == 0).mean()),
            "shape": tuple(a.shape),
        }
        if a.ndim == 4:  # NHWC: dead channels
            dead = (a.max(axis=(0, 1, 2)) <= 0)
            entry["dead_channel_fraction"] = float(dead.mean())
        stats[name] = entry
    return stats


# -- prediction quality (ref nn_quantitative_viz.py:64-255) ----------------

def error_distribution(pred: np.ndarray, gt: np.ndarray,
                       mask: np.ndarray) -> Dict[str, np.ndarray]:
    """Per-keypoint pixel-error statistics."""
    err = np.linalg.norm(pred - gt, axis=-1)  # (B, K)
    valid = mask > 0
    per_kpt_mean = np.array([
        err[:, k][valid[:, k]].mean() if valid[:, k].any() else np.nan
        for k in range(err.shape[1])])
    return {
        "errors": err,
        "per_keypoint_mean": per_kpt_mean,
        "overall_mean": float(err[valid].mean()) if valid.any() else np.nan,
        "overall_median": float(np.median(err[valid])) if valid.any()
            else np.nan,
    }


def confidence_calibration(scores: np.ndarray, correct: np.ndarray,
                           bins: int = 10) -> Dict[str, np.ndarray]:
    """Reliability curve: accuracy within confidence bins + ECE."""
    edges = np.linspace(0, 1, bins + 1)
    accs, confs, weights = [], [], []
    s, c = scores.reshape(-1), correct.reshape(-1)
    for i in range(bins):
        sel = (s >= edges[i]) & (s < edges[i + 1] + (i == bins - 1))
        if sel.any():
            accs.append(float(c[sel].mean()))
            confs.append(float(s[sel].mean()))
            weights.append(sel.mean())
        else:
            accs.append(np.nan)
            confs.append((edges[i] + edges[i + 1]) / 2)
            weights.append(0.0)
    accs_a = np.asarray(accs)
    confs_a = np.asarray(confs)
    w = np.asarray(weights)
    valid = ~np.isnan(accs_a)
    ece = float(np.sum(w[valid] * np.abs(accs_a[valid] - confs_a[valid])))
    return {"bin_accuracy": accs_a, "bin_confidence": confs_a,
            "bin_weight": w, "ece": ece}


# -- sensitivity (ref advanced_analysis.py:313-429) -------------------------

def saliency_map(model, variables, x, keypoint: int) -> np.ndarray:
    """|d max-heatmap-activation / d input| per pixel."""

    def score(img):
        out = model.apply(variables, img[None], False)
        return jnp.max(out["heatmaps"][0, :, :, keypoint])

    g = jax.grad(score)(jnp.asarray(x, jnp.float32))
    return np.asarray(jnp.max(jnp.abs(g), axis=-1))


def occlusion_sensitivity(model, variables, x, keypoint: int,
                          patch: int = 16, stride: int = 16) -> np.ndarray:
    """Score drop when a gray patch slides over the input."""
    x = jnp.asarray(x, jnp.float32)
    H, W = x.shape[:2]
    fwd = jax.jit(lambda img: jnp.max(
        model.apply(variables, img[None], False)["heatmaps"][0, :, :,
                                                             keypoint]))
    base = float(fwd(x))
    hs = list(range(0, H - patch + 1, stride))
    ws = list(range(0, W - patch + 1, stride))
    sens = np.zeros((len(hs), len(ws)))
    for i, y in enumerate(hs):
        for j, xx in enumerate(ws):
            occ = x.at[y:y + patch, xx:xx + patch, :].set(0.0)
            sens[i, j] = base - float(fwd(occ))
    return sens


def grad_cam(model, variables, x, keypoint: int) -> np.ndarray:
    """Grad-CAM over backbone features: relu(sum_c w_c * F_c),
    w = spatial-mean of d score / d F (ref nn_quantitative_viz.py:358-457)."""

    def backbone_feats(img):
        return model.apply(variables, img, False,
                           method=lambda m, v, t: m.backbone(v, t))

    feats = backbone_feats(jnp.asarray(x, jnp.float32)[None])

    def head_score(f):
        out = model.apply(variables, f, False,
                          method=lambda m, v, t: m.head(v, t))
        return jnp.max(out["heatmaps"][0, :, :, keypoint])

    g = jax.grad(head_score)(feats)
    w = jnp.mean(g, axis=(1, 2), keepdims=True)  # (1,1,1,C)
    cam = jax.nn.relu(jnp.sum(w * feats, axis=-1))[0]
    cam = cam / (jnp.max(cam) + 1e-8)
    return np.asarray(cam)


def mc_droppath_uncertainty(model, variables, x, n_samples: int = 10,
                            seed: int = 0) -> Dict[str, np.ndarray]:
    """MC uncertainty via stochastic-depth sampling (train=True forwards),
    the JAX analogue of the reference's MC-dropout
    (advanced_analysis.py:430-485). Returns heatmap mean/std."""
    outs = []
    for i in range(n_samples):
        out = model.apply(variables, x, True,
                          rngs={"dropout": jax.random.PRNGKey(seed + i)},
                          mutable=["batch_stats"])[0]
        outs.append(np.asarray(out["heatmaps"]))
    stack = np.stack(outs)
    return {"mean": stack.mean(0), "std": stack.std(0)}

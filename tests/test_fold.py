"""BN-fold float serving (models/fold.py): exactness vs the float model.

Folding is algebraically exact — norm(conv(x, W)) == conv(x, W*a) + b —
so agreement tolerances are rounding-level in f32, unlike the int8 path's
quantization error.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from infantposeestimation_gaussianbias_tpu.config import Config
from infantposeestimation_gaussianbias_tpu.models import (
    build_model,
    fold_variables,
)
from infantposeestimation_gaussianbias_tpu.models.layers import ConvNorm


def _nontrivial_stats(variables, rng):
    """Perturb batch_stats so folding is non-trivial."""
    def perturb(a):
        return a + jnp.asarray(
            rng.uniform(0.05, 0.5, a.shape).astype(np.float32))
    return {"params": variables["params"],
            "batch_stats": jax.tree_util.tree_map(
                perturb, variables["batch_stats"])}


def test_convnorm_fold_exact(rng):
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    mod = ConvNorm(24, 3, strides=2)
    variables = _nontrivial_stats(mod.init(jax.random.PRNGKey(0), x, False),
                                  rng)
    ref = mod.apply(variables, x, False)

    fvars = fold_variables(variables)
    fmod = ConvNorm(24, 3, strides=2, fold=True)
    out = fmod.apply({"params": fvars["params"]}, x, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("backbone,head", [("hrnet_w32", "fusion"),
                                           ("hrformer_small", "heatmap")])
def test_model_fold_exact(backbone, head, rng):
    cfg = Config()
    cfg.model.backbone = backbone
    cfg.model.head_type = head
    cfg.model.compute_dtype = "float32"
    cfg.data.input_size = (48, 64) if backbone == "hrnet_w32" else (64, 64)
    cfg.data.heatmap_size = (12, 16) if backbone == "hrnet_w32" else (16, 16)

    model = build_model(cfg)
    W, H = cfg.data.input_size
    x = jnp.asarray(rng.randn(2, H, W, 3).astype(np.float32))
    variables = _nontrivial_stats(model.init(jax.random.PRNGKey(0), x, False),
                                  rng)
    ref = model.apply(variables, x, False)

    fvars = fold_variables(variables)
    fmodel = build_model(cfg, fold=True)
    out = fmodel.apply(fvars, x, False)

    for k, v in ref.items():
        scale = float(np.abs(np.asarray(v)).max()) + 1e-6
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(v), rtol=2e-3,
            atol=2e-3 * scale, err_msg=k)

    # the folded tree has no BN scale/bias under ConvNorms, and conv bias
    # appeared
    stem = fvars["params"]["backbone"]["stem1"]
    assert set(stem) == {"conv"}
    assert set(stem["conv"]) == {"kernel", "bias"}


def test_pose_inference_folds_by_default(rng):
    from infantposeestimation_gaussianbias_tpu.inference import PoseInference

    cfg = Config()
    cfg.model.backbone = "hrnet_w32"
    cfg.model.head_type = "fusion"
    cfg.model.compute_dtype = "float32"
    cfg.data.input_size = (48, 64)
    cfg.data.heatmap_size = (12, 16)
    cfg.eval.flip_test = False

    frames = rng.randint(0, 255, (2, 96, 96, 3)).astype(np.uint8)
    bboxes = np.array([[10, 10, 80, 90], [5, 20, 70, 88]], np.float32)

    folded = PoseInference(cfg)
    assert "norm" not in folded._variables["params"]["backbone"]["stem1"]
    k1, s1 = folded.predict_batch(frames, bboxes)

    plain = PoseInference(cfg, fold=False)
    k2, s2 = plain.predict_batch(frames, bboxes)
    np.testing.assert_allclose(k1, k2, rtol=1e-3, atol=5e-2)
    np.testing.assert_allclose(s1, s2, rtol=1e-3, atol=1e-3)


def test_export_serving_fn_folds_by_default(rng):
    """build_serving_fn folds BN for supported architectures; outputs
    must match the unfolded pipeline."""
    from infantposeestimation_gaussianbias_tpu.tools.export_model import (
        build_serving_fn,
    )
    from infantposeestimation_gaussianbias_tpu.train.step import (
        create_train_state,
    )

    cfg = Config()
    cfg.model.backbone = "hrnet_w32"
    cfg.model.head_type = "heatmap"
    cfg.model.compute_dtype = "float32"
    cfg.data.input_size = (48, 64)
    cfg.data.heatmap_size = (12, 16)
    cfg.eval.flip_test = False

    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))

    frames = jnp.asarray(rng.randint(0, 255, (2, 96, 96, 3)).astype(np.uint8))
    centers = jnp.asarray(rng.uniform(30, 60, (2, 2)).astype(np.float32))
    scales = jnp.asarray(np.full((2, 2), 64.0, np.float32))

    k1, s1 = jax.jit(build_serving_fn(cfg, state, (96, 96)))(
        frames, centers, scales)
    k2, s2 = jax.jit(build_serving_fn(cfg, state, (96, 96), fold=False))(
        frames, centers, scales)
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2),
                               rtol=1e-3, atol=5e-2)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-3, atol=1e-3)


def test_fold_rejects_unsupported():
    cfg = Config()
    cfg.model.backbone = "litehrnet"
    cfg.model.head_type = "heatmap"
    model = build_model(cfg, fold=True)
    with pytest.raises(ValueError, match="hrnet"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 48, 3)), False)

"""Photometric (ColorJitter) op tests: numpy-oracle parity with
torchvision's float-tensor blend semantics, determinism from the key,
factor bounds, static no-op, and train-step integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from infantposeestimation_gaussianbias_tpu.ops.photometric import (
    color_jitter,
    color_jitter_normalized,
)

GRAY = np.asarray([0.2989, 0.587, 0.114])


def np_brightness(img, f):
    return np.clip(img * f, 0, 1)


def np_contrast(img, f):
    m = (img @ GRAY).mean()
    return np.clip(f * img + (1 - f) * m, 0, 1)


def np_saturation(img, f):
    g = (img @ GRAY)[..., None]
    return np.clip(f * img + (1 - f) * g, 0, 1)


def test_brightness_only_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    imgs = rng.rand(3, 8, 6, 3).astype(np.float32)
    key = jax.random.PRNGKey(7)
    out = np.asarray(color_jitter(key, jnp.asarray(imgs), 0.3, 0.0, 0.0))
    # recover the per-sample factor from an unclipped pixel and check the
    # whole image is exactly brightness-scaled by it
    for i in range(3):
        mask = (imgs[i] > 1e-3) & (out[i] < 1 - 1e-6)
        f = np.median(out[i][mask] / imgs[i][mask])
        assert 0.7 - 1e-5 <= f <= 1.3 + 1e-5
        np.testing.assert_allclose(out[i], np_brightness(imgs[i], f),
                                   atol=2e-6)


@pytest.mark.parametrize("which", ["contrast", "saturation"])
def test_single_op_matches_numpy_oracle(which):
    rng = np.random.RandomState(1)
    imgs = rng.rand(2, 10, 7, 3).astype(np.float32)
    amt = 0.4
    args = {"brightness": 0.0, "contrast": 0.0, "saturation": 0.0,
            which: amt}
    out = np.asarray(color_jitter(jax.random.PRNGKey(3), jnp.asarray(imgs),
                                  args["brightness"], args["contrast"],
                                  args["saturation"]))
    oracle = np_contrast if which == "contrast" else np_saturation
    for i in range(2):
        # scan candidate factors: the per-sample factor is unknown, so
        # verify SOME f in the legal range reproduces the output exactly
        fs = np.linspace(1 - amt, 1 + amt, 4001)
        errs = [np.abs(oracle(imgs[i], f) - out[i]).max() for f in fs]
        assert min(errs) < 5e-4, f"sample {i}: no factor matches"


def test_deterministic_and_bounded():
    rng = np.random.RandomState(2)
    imgs = rng.rand(4, 12, 9, 3).astype(np.float32)
    key = jax.random.PRNGKey(11)
    a = np.asarray(color_jitter(key, jnp.asarray(imgs), 0.2, 0.2, 0.2))
    b = np.asarray(color_jitter(key, jnp.asarray(imgs), 0.2, 0.2, 0.2))
    np.testing.assert_array_equal(a, b)
    assert a.min() >= 0.0 and a.max() <= 1.0
    # different key -> different jitter
    c = np.asarray(color_jitter(jax.random.PRNGKey(12), jnp.asarray(imgs),
                                0.2, 0.2, 0.2))
    assert np.abs(a - c).max() > 1e-4


def test_per_sample_factors_differ():
    imgs = np.full((4, 6, 6, 3), 0.5, np.float32)
    out = np.asarray(color_jitter(jax.random.PRNGKey(0), jnp.asarray(imgs),
                                  0.3, 0.0, 0.0))
    means = out.mean(axis=(1, 2, 3))
    assert np.unique(np.round(means, 5)).size > 1


def test_zero_amounts_is_identity():
    imgs = jnp.asarray(np.random.RandomState(3).rand(2, 5, 5, 3),
                       jnp.float32)
    out = color_jitter(jax.random.PRNGKey(0), imgs, 0.0, 0.0, 0.0)
    assert out is imgs  # static no-op, not even a copy


def test_normalized_roundtrip_noop():
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    x01 = np.random.RandomState(4).rand(2, 8, 8, 3).astype(np.float32)
    xn = ((x01 - mean) / std).astype(np.float32)
    out = color_jitter_normalized(jax.random.PRNGKey(0), jnp.asarray(xn),
                                  mean, std, 0.0, 0.0, 0.0)
    np.testing.assert_array_equal(np.asarray(out), xn)


def test_train_step_with_jitter_descends():
    from infantposeestimation_gaussianbias_tpu.config import Config
    from infantposeestimation_gaussianbias_tpu.models import build_model
    from infantposeestimation_gaussianbias_tpu.train import (
        create_train_state,
        make_train_step,
    )

    cfg = Config()
    cfg.model.backbone = "litehrnet"
    cfg.model.head_type = "heatmap"
    cfg.model.compute_dtype = "float32"
    cfg.data.input_size = (64, 64)
    cfg.data.heatmap_size = (16, 16)
    cfg.data.color_jitter = (0.2, 0.2, 0.2)
    cfg.train.steps_per_epoch = 10

    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, cfg.data.keypoint_schema))
    rng = np.random.RandomState(5)
    K = cfg.data.num_keypoints
    batch = {
        "image": jnp.asarray(rng.randn(4, 64, 64, 3).astype(np.float32)),
        "keypoints": jnp.asarray(
            rng.uniform(8, 56, (4, K, 2)).astype(np.float32)),
        "visible": jnp.ones((4, K), jnp.float32),
    }
    state, m0 = step(state, batch, jax.random.PRNGKey(1))
    first = float(m0["total_loss"])
    for i in range(6):
        state, m = step(state, batch, jax.random.PRNGKey(i + 2))
    assert np.isfinite(first) and float(m["total_loss"]) < first

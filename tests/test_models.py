"""Model construction / shape / parameter-count tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from infantposeestimation_gaussianbias_tpu.models import (
    PoseEstimator,
    count_params,
)


def _init_and_run(model, shape=(1, 64, 48, 3)):
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, False)
    out = model.apply(variables, x, False)
    return variables, out


@pytest.mark.parametrize("backbone,feat_ch", [
    ("hrnet_w32", 32),
    ("litehrnet", 24),
])
def test_backbone_shapes(backbone, feat_ch):
    model = PoseEstimator(backbone_name=backbone, head_type="heatmap",
                          num_keypoints=17)
    variables, out = _init_and_run(model, (1, 64, 48, 3))
    hm = out["heatmaps"]
    assert hm.shape == (1, 16, 12, 17)  # stride 4
    assert hm.dtype == jnp.float32


def test_hrnet_w32_param_count():
    """Backbone params should land near the reference's 28.5M total
    (BASELINE.md row: HRNet-W32 28.5M including head)."""
    model = PoseEstimator(backbone_name="hrnet_w32", head_type="heatmap",
                          num_keypoints=17)
    variables, _ = _init_and_run(model)
    n = count_params(variables["params"])
    assert 27e6 < n < 30e6, f"param count {n/1e6:.1f}M out of range"


def test_fusion_head_outputs():
    model = PoseEstimator(backbone_name="litehrnet", head_type="fusion",
                          num_keypoints=17, hidden_dim=64)
    variables, out = _init_and_run(model, (2, 64, 48, 3))
    assert out["heatmaps"].shape == (2, 16, 12, 17)
    assert out["offsets"].shape == (2, 16, 12, 17, 2)
    assert out["variances"].shape == (2, 16, 12, 17)
    assert np.all(np.asarray(out["variances"]) > 0)  # softplus
    assert out["fusion_weight_logit"].shape == ()


def test_fused_head_outputs():
    model = PoseEstimator(backbone_name="litehrnet", head_type="fused",
                          num_keypoints=13)
    variables, out = _init_and_run(model, (2, 64, 64, 3))
    assert out["heatmaps"].shape == (2, 16, 16, 13)
    assert out["coords"].shape == (2, 13, 2)
    assert out["refined_coords"].shape == (2, 13, 2)


def test_simcc_head_outputs():
    model = PoseEstimator(backbone_name="litehrnet", head_type="simcc",
                          num_keypoints=17, input_size=(48, 64))
    variables, out = _init_and_run(model, (2, 64, 48, 3))
    assert out["simcc_x"].shape == (2, 17, 96)
    assert out["simcc_y"].shape == (2, 17, 128)
    from infantposeestimation_gaussianbias_tpu.models import SimCCHead
    coords, scores = SimCCHead.decode(out["simcc_x"], out["simcc_y"])
    assert coords.shape == (2, 17, 2)


def test_simcc_decode_oracle(rng):
    """Gaussian logits centered at known sub-pixel coords must decode back
    to those coords (softmax-expectation decode; ref
    analysis/hrnet_improvements.py:205-224), and simcc_loss must be
    minimized at the true coordinates."""
    import jax.numpy as jnp

    from infantposeestimation_gaussianbias_tpu.models import SimCCHead
    from infantposeestimation_gaussianbias_tpu.train.step import simcc_loss

    split = 2.0
    W, H = 48, 64
    nx, ny = int(W * split), int(H * split)
    true = np.stack([rng.uniform(5, W - 5, (2, 17)),
                     rng.uniform(5, H - 5, (2, 17))], -1).astype(np.float32)

    def gauss_logits(mu, n):
        bins = np.arange(n, dtype=np.float32)
        return -((bins - mu[..., None] * split) ** 2) / (2 * 4.0**2)

    sx = jnp.asarray(gauss_logits(true[..., 0], nx) * 10)
    sy = jnp.asarray(gauss_logits(true[..., 1], ny) * 10)
    coords, scores = SimCCHead.decode(sx, sy, split)
    np.testing.assert_allclose(np.asarray(coords), true, atol=0.05)
    assert float(jnp.min(scores)) > 0.1

    # loss at the true coords is lower than at shifted coords
    w = jnp.ones((2, 17), jnp.float32)
    outputs = {"simcc_x": sx, "simcc_y": sy}
    l_true = float(simcc_loss(outputs, jnp.asarray(true), w, (W, H), split))
    l_off = float(simcc_loss(outputs, jnp.asarray(true + 3.0), w, (W, H),
                             split))
    assert l_true < l_off


def test_hrformer_small_shapes():
    model = PoseEstimator(backbone_name="hrformer_small", head_type="fusion",
                          num_keypoints=17, hidden_dim=64)
    variables, out = _init_and_run(model, (1, 64, 48, 3))
    assert out["heatmaps"].shape == (1, 16, 12, 17)


def test_batchnorm_mutable_train_mode():
    model = PoseEstimator(backbone_name="litehrnet", head_type="heatmap",
                          num_keypoints=17)
    x = jnp.ones((2, 64, 48, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, False)
    out, mutated = model.apply(variables, x, True, mutable=["batch_stats"])
    assert "batch_stats" in mutated


def test_bfloat16_compute():
    model = PoseEstimator(backbone_name="litehrnet", head_type="heatmap",
                          num_keypoints=17, dtype=jnp.bfloat16)
    variables, out = _init_and_run(model)
    # Params stay f32; outputs are cast back to f32 by the head.
    leaf = jax.tree_util.tree_leaves(variables["params"])[0]
    assert leaf.dtype == jnp.float32
    assert out["heatmaps"].dtype == jnp.float32


def test_multiscale_flip_inference():
    from infantposeestimation_gaussianbias_tpu.models.pose_estimator import (
        multiscale_flip_inference,
    )
    from infantposeestimation_gaussianbias_tpu.schemas import COCO17

    model = PoseEstimator(backbone_name="litehrnet", head_type="heatmap",
                          num_keypoints=17)
    x = jnp.zeros((2, 64, 48, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, False)
    flip_idx = jnp.asarray(COCO17.flip_index())
    coords, scores = multiscale_flip_inference(
        model.apply, variables, x, flip_idx, "heatmap",
        scales=(1.0, 1.5), flip=True)
    assert coords.shape == (2, 17, 2)
    assert scores.shape == (2, 17)


def test_vertical_flip_transform():
    from infantposeestimation_gaussianbias_tpu.data import transforms as T

    rng_local = np.random.RandomState(0)
    sample = {
        "keypoints": np.array([[10.0, 20.0], [30.0, 90.0]], np.float32),
        "visible": np.ones(2, np.float32),
        "center": np.array([50.0, 60.0], np.float32),
        "scale": np.array([80.0, 80.0], np.float32),
    }
    out = T.random_vertical_flip(rng_local, sample, img_h=100, prob=1.0)
    np.testing.assert_allclose(out["keypoints"][:, 1], [79.0, 9.0])
    np.testing.assert_allclose(out["center"][1], 39.0)
    assert out.get("vflipped")

    # composed matrix equals warping the vertically flipped image
    import cv2
    img = rng_local.randint(0, 255, (100, 120, 3)).astype(np.uint8)
    mat = T.affine_matrix_np(out["center"], out["scale"], (64, 64), 0.0)
    ref = cv2.warpAffine(img[::-1].copy(), mat.astype(np.float64), (64, 64))
    ours = cv2.warpAffine(img, T.compose_vflip(mat, 100).astype(np.float64),
                          (64, 64))
    assert np.mean(np.abs(ours.astype(float) - ref.astype(float))) < 1.0


def test_custom_batchnorm_matches_flax():
    """Our BatchNorm must match flax nn.BatchNorm in both modes."""
    from flax import linen as nn
    from infantposeestimation_gaussianbias_tpu.models.layers import BatchNorm

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 6, 5, 4).astype(np.float32)) * 3 + 1

    ours = BatchNorm()
    theirs = nn.BatchNorm(use_running_average=False, momentum=0.9,
                          epsilon=1e-5)
    v1 = ours.init(jax.random.PRNGKey(0), x, True)
    v2 = theirs.init(jax.random.PRNGKey(0), x)

    o1, m1 = ours.apply(v1, x, True, mutable=["batch_stats"])
    o2, m2 = theirs.apply(v2, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(m1["batch_stats"]["mean"]),
                               np.asarray(m2["batch_stats"]["mean"]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m1["batch_stats"]["var"]),
                               np.asarray(m2["batch_stats"]["var"]),
                               rtol=1e-3, atol=1e-5)

    # eval mode with the updated stats
    v1e = {"params": v1["params"], "batch_stats": m1["batch_stats"]}
    v2e = {"params": v2["params"], "batch_stats": m2["batch_stats"]}
    e1 = ours.apply(v1e, x, False)
    e2 = nn.BatchNorm(use_running_average=True, momentum=0.9,
                      epsilon=1e-5).apply(v2e, x)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2),
                               rtol=2e-4, atol=2e-4)

"""int8 PTQ path: primitives, BN folding, and model-level agreement.

The quantized serving path (ops/quant.py + the models' ``quant`` mode)
must agree with the float model closely enough that decoded keypoints
are unchanged for practical purposes.  Random weights are a *harsher*
test than trained ones (no structure for quantization to exploit).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from infantposeestimation_gaussianbias_tpu.config import Config
from infantposeestimation_gaussianbias_tpu.models import (
    build_model,
    decode_outputs,
    quantize_model,
)
from infantposeestimation_gaussianbias_tpu.models.layers import ConvNorm
from infantposeestimation_gaussianbias_tpu.models.quantize import (
    calibrate,
    strip_float_params,
)
from infantposeestimation_gaussianbias_tpu.ops import quant as Q


def test_quantize_weight_roundtrip():
    rng = np.random.RandomState(0)
    w = rng.randn(3, 3, 16, 32).astype(np.float32)
    w[..., 5] *= 40.0  # one hot channel must not ruin the others
    q = Q.quantize_weight(jnp.asarray(w))
    assert q["w_int8"].dtype == jnp.int8
    deq = np.asarray(q["w_int8"], np.float32) * np.asarray(q["w_scale"])
    # per-channel error bound: half an lsb of that channel's scale
    err = np.abs(deq - w).max(axis=(0, 1, 2))
    bound = np.asarray(q["w_scale"]) * 0.5 + 1e-8
    assert (err <= bound).all()


def test_quantize_act_roundtrip():
    rng = np.random.RandomState(1)
    x = rng.randn(4, 8, 8, 16).astype(np.float32)
    qt = Q.quantize_act(jnp.asarray(x), jnp.abs(x).max())
    assert qt.data.dtype == jnp.int8
    assert np.abs(qt.dequantize() - x).max() <= float(qt.scale) * 0.5 + 1e-8


def test_fold_batchnorm_matches_inference_bn():
    from infantposeestimation_gaussianbias_tpu.models.layers import BatchNorm

    rng = np.random.RandomState(2)
    C = 24
    x = jnp.asarray(rng.randn(2, 6, 6, C).astype(np.float32))
    scale = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(C).astype(np.float32))
    mean = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    var = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)

    bn = BatchNorm()
    out = bn.apply({"params": {"scale": scale, "bias": bias},
                    "batch_stats": {"mean": mean, "var": var}}, x, False)
    a, b = Q.fold_batchnorm(scale, bias, mean, var)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x * a + b),
                               rtol=1e-6, atol=1e-6)


def test_convnorm_quant_matches_float():
    """Single ConvNorm: int8 path vs float path, both from the same
    weights/stats, on inputs quantized with an exact-range scale."""
    rng = np.random.RandomState(3)
    x = rng.randn(2, 8, 8, 16).astype(np.float32)

    float_mod = ConvNorm(24, 3, strides=2, calibrate=True)
    variables = float_mod.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    # non-trivial BN stats
    stats = {"norm": {"bn": {
        "mean": jnp.asarray(rng.randn(24).astype(np.float32) * 0.1),
        "var": jnp.asarray(rng.rand(24).astype(np.float32) + 0.5)}}}
    variables = {"params": variables["params"], "batch_stats": stats}

    ref, mutated = float_mod.apply(variables, jnp.asarray(x), False,
                                   mutable=["calib"])
    calib = mutated["calib"]

    qp = Q.convert_convnorm(
        jax.tree_util.tree_map(np.asarray, variables["params"]),
        stats, calib["out_absmax"])
    qmod = ConvNorm(24, 3, strides=2, quant=True)
    xq = Q.quantize_act(jnp.asarray(x), np.abs(x).max())
    out = qmod.apply({"qparams": qp}, xq, False)

    assert out.data.dtype == jnp.int8
    deq = np.asarray(out.dequantize())
    ref = np.asarray(ref)
    denom = np.abs(ref).max()
    assert np.abs(deq - ref).max() / denom < 0.05
    cos = (ref * deq).sum() / np.sqrt((ref ** 2).sum() * (deq ** 2).sum())
    assert cos > 0.995


def test_convnorm_quant_stride2_padding_matches_torch_convention():
    """Stride-2 int8 conv must use symmetric (1,1) padding like the float
    path (torch convention), NOT XLA SAME padding (which pads (0,1))."""
    rng = np.random.RandomState(4)
    x = rng.randn(1, 8, 8, 8).astype(np.float32)
    mod = ConvNorm(8, 3, strides=2, calibrate=True)
    variables = mod.init(jax.random.PRNGKey(1), jnp.asarray(x), False)
    ref, mut = mod.apply(variables, jnp.asarray(x), False, mutable=["calib"])
    qp = Q.convert_convnorm(variables["params"], variables["batch_stats"],
                            mut["calib"]["out_absmax"])
    qmod = ConvNorm(8, 3, strides=2, quant=True)
    out = qmod.apply({"qparams": qp},
                     Q.quantize_act(jnp.asarray(x), np.abs(x).max()), False)
    # identical shape and close values everywhere, including the border
    # rows/cols that differ between SAME and symmetric padding
    assert out.data.shape == ref.shape
    assert np.abs(np.asarray(out.dequantize()) -
                  np.asarray(ref)).max() < 0.05 * np.abs(ref).max()


@pytest.fixture(scope="module")
def fusion_setup():
    cfg = Config()
    cfg.model.backbone = "hrnet_w32"
    cfg.model.head_type = "fusion"
    cfg.model.compute_dtype = "float32"
    cfg.data.input_size = (48, 64)
    cfg.data.heatmap_size = (12, 16)

    model = build_model(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 48, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    # perturb batch_stats so BN folding is non-trivial
    bs = jax.tree_util.tree_map(
        lambda a: a + 0.01 * jnp.arange(a.size, dtype=a.dtype
                                        ).reshape(a.shape) / max(a.size, 1),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}
    calib_batches = [x, jnp.asarray(
        rng.randn(2, 64, 48, 3).astype(np.float32))]
    return cfg, model, variables, x, calib_batches


def test_model_level_quant_agreement(fusion_setup):
    cfg, model, variables, x, batches = fusion_setup
    float_out = model.apply(variables, x, False)

    qvars = quantize_model(cfg, variables, batches)
    qmodel = build_model(cfg, quant=True)
    q_out = qmodel.apply(qvars, x, False)

    for k in ("heatmaps", "offsets", "variances"):
        a = np.asarray(float_out[k]).ravel()
        b = np.asarray(q_out[k]).ravel()
        cos = (a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum() + 1e-12)
        assert cos > 0.995, f"{k}: cos={cos}"

    # decode runs and is finite (random-weight heatmaps are near-uniform,
    # so peak *locations* are chaotic under any perturbation — the
    # decoded-keypoint/AP agreement guard runs on trained weights in
    # tools/pipeline_proof.py --quantize)
    cq, sq = decode_outputs(q_out, "fusion")
    assert np.isfinite(np.asarray(cq)).all()
    assert np.isfinite(np.asarray(sq)).all()

    # the stripped float tree really is minimal: backbone gone
    assert "backbone" not in qvars["params"]
    assert set(qvars["params"]["head"]) == {
        "hm_final", "off_final", "var_final",
        "fusion_weight", "subpixel_alpha"}


def test_quant_weights_are_int8_and_small(fusion_setup):
    cfg, model, variables, x, batches = fusion_setup
    qvars = quantize_model(cfg, variables, batches)
    leaves = jax.tree_util.tree_leaves(qvars["qparams"])
    int8_bytes = sum(l.size for l in leaves if l.dtype == jnp.int8)
    float_bytes = sum(l.size * 4 for l in
                      jax.tree_util.tree_leaves(variables["params"]))
    # int8 weight payload is ~1/4 the float tree
    assert int8_bytes < 0.3 * float_bytes
    # every ConvNorm produced a w_int8 (305 in HRNet-W32 + 5 in the head)
    n_wint8 = sum(1 for p, l in
                  jax.tree_util.tree_leaves_with_path(qvars["qparams"])
                  if p[-1].key == "w_int8")
    assert n_wint8 == 310


def test_calibration_accumulates_running_max(fusion_setup):
    cfg, model, variables, x, batches = fusion_setup
    c1 = calibrate(cfg, variables, [batches[0]])
    c2 = calibrate(cfg, variables, batches)

    leaves1 = jax.tree_util.tree_leaves(c1)
    leaves2 = jax.tree_util.tree_leaves(c2)
    assert len(leaves1) == len(leaves2)
    # running max can only grow
    assert all(float(b) >= float(a) - 1e-7
               for a, b in zip(leaves1, leaves2))
    # and strictly grows somewhere (different batches)
    assert any(float(b) > float(a) for a, b in zip(leaves1, leaves2))


def test_quant_requires_supported_architecture():
    cfg = Config()
    cfg.model.backbone = "litehrnet"
    cfg.model.head_type = "heatmap"
    model = build_model(cfg, quant=True)
    with pytest.raises(ValueError, match="hrnet"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 48, 3)), False)


def test_qdense_matches_float_dense():
    """qdense: int8 matmul + f32 epilogue vs float Dense on the same
    weights (input quantized with its exact range)."""
    rng = np.random.RandomState(5)
    x = rng.randn(6, 49, 32).astype(np.float32)
    kernel = rng.randn(32, 96).astype(np.float32)
    bias = rng.randn(96).astype(np.float32)

    ref = x @ kernel + bias
    q = Q.convert_dense({"kernel": jnp.asarray(kernel),
                         "bias": jnp.asarray(bias)},
                        np.abs(x).max())
    out = np.asarray(Q.qdense(jnp.asarray(x), q))
    denom = np.abs(ref).max()
    assert np.abs(out - ref).max() / denom < 0.05
    cos = (ref * out).sum() / np.sqrt((ref ** 2).sum() * (out ** 2).sum())
    assert cos > 0.995


def test_hrformer_dense_ptq_model_agreement():
    """hrformer_small Dense-PTQ: calibrate -> convert -> int8 serve; the
    quantized forward must track the float forward closely, the quantized
    Dense float weights must be stripped, and the qparams tree must hold
    ONLY qdense nodes."""
    cfg = Config()
    cfg.model.backbone = "hrformer_small"
    cfg.model.head_type = "heatmap"
    cfg.model.compute_dtype = "float32"
    cfg.data.input_size = (64, 64)
    cfg.data.heatmap_size = (16, 16)

    model = build_model(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    float_out = model.apply(variables, x, False)

    qvars = quantize_model(cfg, variables, [x])
    qmodel = build_model(cfg, quant=True)
    q_out = qmodel.apply(qvars, x, False)

    a = np.asarray(float_out["heatmaps"]).ravel()
    b = np.asarray(q_out["heatmaps"]).ravel()
    cos = (a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum() + 1e-12)
    assert cos > 0.99, f"cos={cos}"

    # every qparams leaf node is a qdense pack (conv qparams pruned)
    def check(node):
        if isinstance(node, dict):
            if "w_int8" in node:
                assert set(node) == {"w_int8", "w_scale", "bias",
                                     "in_scale"}
                assert node["w_int8"].dtype == jnp.int8
                assert node["w_int8"].ndim == 2
            else:
                for v in node.values():
                    check(v)
    check(qvars["qparams"])

    # the float twin of each quantized Dense is stripped, the rest kept.
    # Width gate (QUANT_MIN_FEATURES=128): the C=128 branch quantizes all
    # four Dense layers; the C=32 branch only fc2 (in=4C=128).
    wide = qvars["params"]["backbone"]["stage3_module0"]["branch2_block0"]
    assert "qkv" not in wide["attn"] and "rpe_table" in wide["attn"]
    assert "fc1" not in wide.get("mlp", {})
    narrow = qvars["params"]["backbone"]["stage2_module0"]["branch0_block0"]
    assert "qkv" in narrow["attn"]          # C=32: stays float
    assert "fc1" in narrow["mlp"] and "fc2" not in narrow["mlp"]
    assert "norm1" in wide and "head" in qvars["params"]
    assert "batch_stats" in qvars  # float conv trunk still runs BN

    # per-C quantized-Dense counts for hrformer_small (blocks by channel:
    # C=32/64 -> 14 each, C=128 -> 12, C=256 -> 4):
    # C=32/64: fc2 only (1); C=128/256: all 4
    n_dense = sum(1 for p, l in
                  jax.tree_util.tree_leaves_with_path(qvars["qparams"])
                  if p[-1].key == "in_scale")
    assert n_dense == 14 * 1 + 14 * 1 + 12 * 4 + 4 * 4


def test_pose_inference_int8_serving():
    """PoseInference(quantize=True): first-batch self-calibration then the
    int8 pipeline end to end (crop -> quant forward -> decode -> back-
    project)."""
    from infantposeestimation_gaussianbias_tpu.inference import PoseInference

    cfg = Config()
    cfg.model.backbone = "hrnet_w32"
    cfg.model.head_type = "fusion"
    cfg.model.compute_dtype = "float32"
    cfg.data.input_size = (48, 64)
    cfg.data.heatmap_size = (12, 16)
    cfg.eval.flip_test = False

    infer = PoseInference(cfg, quantize=True)
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (2, 96, 96, 3)).astype(np.uint8)
    bboxes = np.array([[10, 10, 80, 90], [5, 20, 70, 88]], np.float32)
    kpts, scores = infer.predict_batch(frames, bboxes)
    assert kpts.shape == (2, 17, 2) and scores.shape == (2, 17)
    assert np.isfinite(kpts).all() and np.isfinite(scores).all()
    # quant variables installed: float backbone gone from serving tree
    assert "qparams" in infer._variables
    assert "backbone" not in infer._variables["params"]
    # second call reuses the installed pipeline
    kpts2, _ = infer.predict_batch(frames, bboxes)
    np.testing.assert_allclose(kpts, kpts2, rtol=1e-5, atol=1e-5)


def test_install_quant_invalidates_crops_pipeline_cache():
    """_install_quant mutates _apply_fn, so it must drop the cached
    _jit_crops_pipeline closure at the mutation site — any install path
    that skipped the invalidation would keep serving the stale float
    closure against int8 variables."""
    from infantposeestimation_gaussianbias_tpu.inference import PoseInference

    cfg = Config()
    cfg.model.backbone = "hrnet_w32"
    cfg.model.head_type = "fusion"
    cfg.model.compute_dtype = "float32"
    cfg.data.input_size = (48, 64)
    cfg.data.heatmap_size = (12, 16)
    cfg.eval.flip_test = False

    infer = PoseInference(cfg, quantize=True)
    stale = infer._crops_pipeline_jit()  # build float closure first
    assert infer._jit_crops_pipeline is stale
    rng = np.random.RandomState(1)
    crops = rng.uniform(-2, 2, (64, 64, 48, 3)).astype(np.float32)
    infer._install_quant([crops])
    assert not hasattr(infer, "_jit_crops_pipeline")
    assert infer._crops_pipeline_jit() is not stale


def test_pose_inference_int8_rejects_unsupported():
    from infantposeestimation_gaussianbias_tpu.inference import PoseInference

    cfg = Config()
    cfg.model.backbone = "litehrnet"
    cfg.model.head_type = "heatmap"
    cfg.data.input_size = (48, 64)
    cfg.data.heatmap_size = (12, 16)
    with pytest.raises(ValueError):
        PoseInference(cfg, quantize=True)

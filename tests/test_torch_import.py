"""Torch checkpoint import + cross-framework forward parity.

The strongest structural parity check in the suite: build the
reference-structured torch HRNet + fusion head (tests/torch_hrnet_oracle),
convert its state_dict with tools/import_torch_checkpoint, and verify the
flax models produce the SAME outputs on the same inputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from infantposeestimation_gaussianbias_tpu.models import PoseEstimator
from infantposeestimation_gaussianbias_tpu.models.hrformer import HRFormer
from infantposeestimation_gaussianbias_tpu.tools.import_torch_checkpoint import (
    convert_checkpoint,
    convert_fusion_head,
    convert_hrformer_backbone,
    convert_hrnet_backbone,
    detect_backbone_family,
)
from tests.torch_hrnet_oracle import TorchFusionHead, TorchHRNet


def _randomize(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for name, b in module.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.01)
            elif name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=g) * 0.5 + 0.75)


def test_hrnet_forward_parity_torch_vs_flax():
    tm = TorchHRNet(base=32).eval()
    _randomize(tm)
    sd = {f"backbone.{k}": v.numpy() for k, v in tm.state_dict().items()}

    params, stats = convert_hrnet_backbone(sd)

    model = PoseEstimator(backbone_name="hrnet_w32", head_type="heatmap",
                          num_keypoints=17)
    x = np.random.RandomState(0).randn(2, 64, 48, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), False)

    # graft converted backbone weights into the initialized tree
    new_params = dict(variables["params"])
    new_params["backbone"] = jax.tree_util.tree_map(
        jnp.asarray, params)
    new_stats = dict(variables["batch_stats"])
    new_stats["backbone"] = jax.tree_util.tree_map(jnp.asarray, stats)

    # shape agreement with the initialized tree (catches mapping errors)
    ref_shapes = jax.tree_util.tree_map(jnp.shape,
                                        variables["params"]["backbone"])
    got_shapes = jax.tree_util.tree_map(np.shape, params)
    assert ref_shapes == got_shapes

    def flax_backbone(v, imgs):
        return model.apply(v, imgs, False,
                           method=lambda m, a, t: m.backbone(a, t))

    ours = np.asarray(flax_backbone(
        {"params": new_params, "batch_stats": new_stats}, jnp.asarray(x)))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_fusion_head_forward_parity_torch_vs_flax():
    th = TorchFusionHead(in_ch=32, K=17, hidden=64).eval()
    _randomize(th, seed=1)
    sd = {f"head.{k}": v.numpy() for k, v in th.state_dict().items()}
    params, stats = convert_fusion_head(sd)

    from infantposeestimation_gaussianbias_tpu.models.heads import FusionHead

    head = FusionHead(17, 64)
    x = np.random.RandomState(1).randn(2, 16, 12, 32).astype(np.float32)
    variables = head.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    ref_shapes = jax.tree_util.tree_map(jnp.shape, variables["params"])
    got_shapes = jax.tree_util.tree_map(np.shape, params)
    assert ref_shapes == got_shapes

    out = head.apply({"params": jax.tree_util.tree_map(jnp.asarray, params),
                      "batch_stats": jax.tree_util.tree_map(
                          jnp.asarray, stats)}, jnp.asarray(x), False)
    with torch.no_grad():
        ref = th(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    np.testing.assert_allclose(
        np.asarray(out["heatmaps"]),
        ref["heatmaps"].numpy().transpose(0, 2, 3, 1),
        rtol=1e-3, atol=1e-4)
    # offsets: ours (B,H,W,K,2) vs torch (B,K,2,H,W)
    np.testing.assert_allclose(
        np.asarray(out["offsets"]),
        ref["offsets"].numpy().transpose(0, 3, 4, 1, 2),
        rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["variances"]),
        ref["variances"].numpy().transpose(0, 2, 3, 1),
        rtol=1e-3, atol=1e-4)
    assert float(out["fusion_weight_logit"]) == pytest.approx(
        float(th.fusion_weight.detach()))
    assert float(out["subpixel_alpha_logit"]) == pytest.approx(
        float(th.subpixel_refine.alpha.detach()))


def test_hrformer_forward_parity_torch_vs_flax():
    """End-to-end tiny HRFormer backbone: reference-structured torch model
    -> importer -> flax forward must match (W-MSA + RPE table layout is
    the silent-failure hotspot; a transposed bias survives every
    self-consistency test but not this one)."""
    from tests.torch_hrformer_oracle import TorchHRFormer

    channels, heads = (8, 16, 32, 64), (1, 2, 4, 8)
    tm = TorchHRFormer(channels=channels, heads=heads,
                       stage_modules=(1, 1, 1)).eval()
    _randomize(tm, seed=2)
    sd = {f"backbone.{k}": v.numpy() for k, v in tm.state_dict().items()}
    assert detect_backbone_family(sd) == "hrformer"

    params, stats = convert_hrformer_backbone(sd)

    model = HRFormer(channels=channels, num_heads=heads,
                     stage_modules=(1, 1, 1), drop_path_rate=0.0)
    x = np.random.RandomState(2).randn(2, 64, 48, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), False)

    ref_shapes = jax.tree_util.tree_map(jnp.shape, variables["params"])
    got_shapes = jax.tree_util.tree_map(np.shape, params)
    assert ref_shapes == got_shapes

    ours = np.asarray(model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
        jnp.asarray(x), False))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_hrformer_block_rpe_bias_orientation():
    """Isolated WindowAttention parity on an asymmetric RPE table: the
    (N, N) bias must be gathered with the same row/col orientation as the
    reference (ref models/hrformer.py:186-192)."""
    from tests.torch_hrformer_oracle import WindowAttention as TWA

    dim, heads, ws = 16, 2, 7
    twa = TWA(dim, ws, heads).eval()
    _randomize(twa, seed=3)
    # overwrite the table with a strongly asymmetric pattern
    with torch.no_grad():
        t = torch.arange((2 * ws - 1) ** 2 * heads, dtype=torch.float32)
        twa.relative_position_bias_table.copy_(
            (t.reshape(-1, heads) % 17) * 0.05)
    sd = {k: v.numpy() for k, v in twa.state_dict().items()}

    from infantposeestimation_gaussianbias_tpu.models.hrformer import (
        WindowAttention,
    )
    from infantposeestimation_gaussianbias_tpu.tools.import_torch_checkpoint import (
        _dense,
    )

    params = {"qkv": _dense(sd, "qkv"), "proj": _dense(sd, "proj"),
              "rpe_table": np.asarray(sd["relative_position_bias_table"])}
    wa = WindowAttention(dim, ws, heads)
    x = np.random.RandomState(3).randn(6, ws * ws, dim).astype(np.float32)
    out = np.asarray(wa.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x), False))
    with torch.no_grad():
        ref = twa(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_hrformer_base_full_size_conversion_shapes():
    """Full HRFormer-Base state-dict (the reference's headline model,
    README.md:224-227) converts with shapes matching the flax init tree —
    checked via eval_shape so no full-size forward/init runs."""
    from tests.torch_hrformer_oracle import TorchHRFormer

    tm = TorchHRFormer()  # base: (78,156,312,624), modules (1,4,2)
    sd = {f"backbone.{k}": v.numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_hrformer_backbone(sd)

    model = HRFormer()  # base defaults
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 192, 3), jnp.float32), False))
    ref_p = jax.tree_util.tree_map(lambda s: s.shape, shapes["params"])
    got_p = jax.tree_util.tree_map(np.shape, params)
    assert ref_p == got_p
    ref_s = jax.tree_util.tree_map(lambda s: s.shape, shapes["batch_stats"])
    got_s = jax.tree_util.tree_map(np.shape, stats)
    assert ref_s == got_s


def test_full_checkpoint_conversion_shapes():
    tm = TorchHRNet(base=32).eval()
    th = TorchFusionHead(in_ch=32, K=17, hidden=256).eval()
    sd = {f"backbone.{k}": v.numpy() for k, v in tm.state_dict().items()}
    sd.update({f"head.{k}": v.numpy() for k, v in th.state_dict().items()})
    params, stats = convert_checkpoint(sd, head_type="fusion")

    model = PoseEstimator(backbone_name="hrnet_w32", head_type="fusion",
                          num_keypoints=17, hidden_dim=256)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 48, 3)), False)
    ref_shapes = jax.tree_util.tree_map(jnp.shape, variables["params"])
    got_shapes = jax.tree_util.tree_map(np.shape, params)
    assert ref_shapes == got_shapes

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
from infantposeestimation_gaussianbias_tpu.tools.import_torch_checkpoint import (
    convert_checkpoint,
    convert_fusion_head,
    convert_hrnet_backbone,
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

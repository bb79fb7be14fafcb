"""Multi-chip serving: PoseInference over a ('data', 'model') mesh.

The reference serves strictly single-device
(/root/reference/inference.py:24-284 — one GPU, one crop at a time);
here serving is mesh-native: batches shard over the 'data' axis (ragged
batches padded to a multiple of it and trimmed on the way out), params
replicate — or shard over 'model' under tensor_parallel — and XLA
inserts the collectives.  Parity vs single-device serving on the
8-virtual-device CPU mesh.
"""

import numpy as np
import pytest

import jax

from infantposeestimation_gaussianbias_tpu.config import Config
from infantposeestimation_gaussianbias_tpu.inference import PoseInference
from infantposeestimation_gaussianbias_tpu.models import build_model
from infantposeestimation_gaussianbias_tpu.parallel import (
    create_mesh,
    sharding_table,
)
from infantposeestimation_gaussianbias_tpu.train.step import (
    create_train_state,
)


def _tiny_cfg(backbone="litehrnet", head="heatmap"):
    cfg = Config()
    cfg.model.backbone = backbone
    cfg.model.head_type = head
    cfg.model.compute_dtype = "float32"
    cfg.data.input_size = (48, 64)
    cfg.data.heatmap_size = (12, 16)
    cfg.eval.flip_test = False
    return cfg


@pytest.fixture(scope="module")
def lite_state():
    cfg = _tiny_cfg()
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(3))
    return cfg, state


def _frames_bboxes(n, rng):
    frames = rng.randint(0, 255, (n, 96, 96, 3)).astype(np.uint8)
    bboxes = np.stack([
        np.array([5 + i, 8, 80 - i, 90], np.float32) for i in range(n)
    ])
    return frames, bboxes


def test_mesh_predict_batch_parity_ragged(lite_state, rng):
    """A 4x2 mesh must reproduce single-device results, including a
    batch size (5) NOT divisible by the data axis (4): pad + trim."""
    cfg, state = lite_state
    single = PoseInference(cfg, state=state)
    mesh = create_mesh(4, 2)
    sharded = PoseInference(cfg, state=state, mesh=mesh)

    frames, bboxes = _frames_bboxes(5, rng)
    k0, s0 = single.predict_batch(frames, bboxes)
    k1, s1 = sharded.predict_batch(frames, bboxes)
    assert k1.shape == (5, 17, 2) and s1.shape == (5, 17)
    np.testing.assert_allclose(k0, k1, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(s0, s1, rtol=1e-5, atol=1e-5)


def test_mesh_predict_stream_parity(lite_state, rng):
    """predict_stream under a mesh: the transfer thread places each
    batch with the 'data' sharding; results match single-device, the
    ragged final batch included."""
    cfg, state = lite_state
    single = PoseInference(cfg, state=state)
    mesh = create_mesh(8, 1)
    sharded = PoseInference(cfg, state=state, mesh=mesh)

    sizes = (8, 8, 3)  # last batch ragged vs the 8-wide data axis
    batches = []
    for n in sizes:
        frames, bboxes = _frames_bboxes(n, rng)
        centers = (bboxes[:, :2] + bboxes[:, 2:]) / 2.0
        scales = (bboxes[:, 2:] - bboxes[:, :2]) * cfg.data.bbox_padding
        # the loader eval contract ships pre-cropped u8 crops
        crops = rng.randint(0, 255, (n, 64, 48, 3)).astype(np.uint8)
        batches.append(
            {"image_u8": crops, "center": centers, "scale": scales})

    ref = list(single.predict_stream(iter(batches), max_in_flight=2))
    out = list(sharded.predict_stream(iter(batches), max_in_flight=2))
    assert [c.shape[0] for c, _ in out] == list(sizes)
    for (rc, rs), (oc, os_) in zip(ref, out):
        np.testing.assert_allclose(rc, oc, rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(rs, os_, rtol=1e-5, atol=1e-5)


def test_mesh_tensor_parallel_serving(rng):
    """tensor_parallel=True actually shards fusion-head kernels over
    'model' (sharding table non-empty) and still matches replicated
    serving numerically."""
    cfg = _tiny_cfg("hrnet_w32", "fusion")
    state = create_train_state(cfg, build_model(cfg), jax.random.PRNGKey(0))
    mesh = create_mesh(4, 2)
    repl = PoseInference(cfg, state=state, mesh=mesh)
    tp = PoseInference(cfg, state=state, mesh=mesh, tensor_parallel=True)

    table = sharding_table(tp._variables)
    assert table, "no kernel picked up a 'model' sharding"
    assert all("model" in spec for spec in table.values())
    assert not sharding_table(repl._variables)

    frames, bboxes = _frames_bboxes(4, rng)
    k0, s0 = repl.predict_batch(frames, bboxes)
    k1, s1 = tp.predict_batch(frames, bboxes)
    np.testing.assert_allclose(k0, k1, rtol=1e-4, atol=5e-3)
    np.testing.assert_allclose(s0, s1, rtol=1e-4, atol=1e-4)


def test_mesh_int8_serving_parity(rng):
    """int8 PTQ serving composes with the mesh: identical calibration,
    then the sharded quant forward matches single-device.  (Decoded
    coords are NOT compared end to end here: on a random-init network
    the soft-argmax decode amplifies int8 rounding-order flips into
    arbitrary coordinate jumps — the float/TP tests above cover e2e
    mesh-plumbing parity.)"""
    import jax.numpy as jnp

    cfg = _tiny_cfg("hrnet_w32", "fusion")
    state = create_train_state(cfg, build_model(cfg), jax.random.PRNGKey(1))
    calib = rng.randn(4, 64, 48, 3).astype(np.float32)

    single = PoseInference(cfg, state=state, quantize=True,
                           calibration_crops=calib)
    mesh = create_mesh(4, 2)
    sharded = PoseInference(cfg, state=state, quantize=True, mesh=mesh,
                            calibration_crops=calib)
    assert "qparams" in sharded._variables

    x = jnp.asarray(rng.randn(4, 64, 48, 3).astype(np.float32))
    out0 = single._apply_fn(single._variables, x, False)
    out1 = sharded._apply_fn(sharded._variables,
                             sharded._place_rows(np.asarray(x)), False)
    for k in out0:
        a, b = np.asarray(out0[k]), np.asarray(out1[k])
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3 * scale,
                                   err_msg=k)

    # e2e smoke through the sharded int8 pipeline (ragged batch of 3)
    frames, bboxes = _frames_bboxes(3, rng)
    k1, s1 = sharded.predict_batch(frames, bboxes)
    assert k1.shape == (3, 17, 2) and s1.shape == (3, 17)
    assert np.isfinite(k1).all() and np.isfinite(s1).all()
    k2, _ = sharded.predict_batch(frames, bboxes)
    np.testing.assert_allclose(k1, k2, rtol=1e-5, atol=1e-5)

"""End-to-end slice: synthetic COCO -> train -> validate -> infer -> viz.

Exercises every layer L1-L6 (SURVEY.md section 7.2 phase 3) with a tiny
model on the 8-virtual-device CPU mesh.
"""

import os

import numpy as np
import pytest

import jax

from infantposeestimation_gaussianbias_tpu.config import Config
from infantposeestimation_gaussianbias_tpu.data import (
    CocoIndex,
    DataLoader,
    PoseDataset,
    build_records,
    synthetic_coco_dataset,
)
from infantposeestimation_gaussianbias_tpu.schemas import COCO17


@pytest.fixture(scope="module")
def setup():
    cfg = Config()
    cfg.model.backbone = "litehrnet"
    cfg.model.head_type = "heatmap"
    cfg.model.compute_dtype = "float32"
    cfg.data.input_size = (64, 64)
    cfg.data.heatmap_size = (16, 16)
    cfg.train.global_batch_size = 8
    cfg.eval.batch_size = 8
    cfg.train.lr = 1e-3
    cfg.train.warmup_epochs = 0
    cfg.train.val_interval = 100  # no mid-train val
    cfg.train.log_interval = 1000
    cfg.eval.flip_test = True

    synth = synthetic_coco_dataset(num_images=16, num_keypoints=17, seed=7,
                                   keypoint_names=COCO17.keypoint_names,
                                   skeleton=COCO17.skeleton)
    rng = np.random.RandomState(7)
    cache = {im["file_name"]: rng.randint(0, 255, (256, 320, 3))
             .astype(np.uint8) for im in synth["images"]}
    index = CocoIndex(dataset=synth)
    recs = build_records(index)
    train_ds = PoseDataset(cfg, recs, "", is_train=True, image_cache=cache)
    val_ds = PoseDataset(cfg, recs, "", is_train=False, image_cache=cache)
    train_loader = DataLoader(train_ds, 8, shuffle=True, seed=0)
    val_loader = DataLoader(val_ds, 8, shuffle=False)
    return cfg, synth, train_loader, val_loader, cache


def test_train_and_validate(setup, tmp_path):
    from infantposeestimation_gaussianbias_tpu.train.loop import (
        train,
        validate,
    )

    cfg, synth, train_loader, val_loader, _ = setup
    cfg.train.checkpoint_dir = str(tmp_path / "ckpt")
    state = train(cfg, train_loader, max_epochs=2, use_mesh=True)
    assert int(state.step) == 2 * len(train_loader)

    results = validate(cfg, state, val_loader, synth)
    assert set(results) >= {"AP", "AP50", "AP75", "AR"}
    assert np.isfinite(results["AP"])
    # checkpoints written
    assert os.path.exists(os.path.join(cfg.train.checkpoint_dir, "latest"))


def test_checkpoint_roundtrip(setup, tmp_path):
    from infantposeestimation_gaussianbias_tpu.models import build_model
    from infantposeestimation_gaussianbias_tpu.train.checkpoint import (
        CheckpointManager,
    )
    from infantposeestimation_gaussianbias_tpu.train.step import (
        create_train_state,
    )

    cfg = setup[0]
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(tmp_path / "ck"), save_every=1)
    best, is_best = mgr.save(state, 0, {"AP": 0.5}, -np.inf)
    assert is_best and best == 0.5
    best, is_best = mgr.save(state, 1, {"AP": 0.4}, best)
    assert not is_best

    state2 = create_train_state(cfg, model, jax.random.PRNGKey(42))
    restored, meta = mgr.restore(state2, "best")
    assert meta is not None and int(meta["epoch"]) == 0
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_inference_api(setup):
    from infantposeestimation_gaussianbias_tpu.inference import PoseInference

    cfg = setup[0]
    infer = PoseInference(cfg)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (200, 300, 3)).astype(np.uint8)
    kpts, scores = infer.predict(img, bbox=[50, 20, 250, 180])
    assert kpts.shape == (17, 2)
    assert scores.shape == (17,)
    # batch path
    frames = rng.randint(0, 255, (3, 200, 300, 3)).astype(np.uint8)
    bboxes = np.tile([50, 20, 250, 180], (3, 1)).astype(np.float32)
    kb, sb = infer.predict_batch(frames, bboxes)
    assert kb.shape == (3, 17, 2)


def test_viz_smoke(setup, tmp_path):
    from infantposeestimation_gaussianbias_tpu.viz import (
        create_clinical_report_figure,
        create_grid_image,
        draw_bbox,
        draw_heatmaps,
        draw_skeleton,
        plot_movement_trajectory,
    )
    from infantposeestimation_gaussianbias_tpu.schemas import INFANT13

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (128, 96, 3)).astype(np.uint8)
    kpts = rng.uniform(10, 80, (17, 2))
    out = draw_skeleton(img, kpts, np.ones(17))
    assert out.shape == img.shape
    hm = rng.uniform(0, 1, (16, 12, 17)).astype(np.float32)
    out = draw_heatmaps(img, hm)
    assert out.shape == img.shape
    out = draw_bbox(img, [5, 5, 90, 120])
    grid = create_grid_image([img, img, img], cols=2)
    assert grid.shape[0] > img.shape[0]

    traj = rng.uniform(0, 100, (30, 13, 2))
    scores = rng.uniform(0.3, 1.0, (30, 13))
    plot_movement_trajectory(traj, INFANT13,
                             out_path=str(tmp_path / "traj.png"))
    create_clinical_report_figure(traj, scores, INFANT13,
                                  out_path=str(tmp_path / "report.png"))
    assert (tmp_path / "report.png").exists()


def test_video_inference_and_overlay(setup, tmp_path):
    """Video -> per-frame pose -> temporal smoothing -> overlay video."""
    import cv2

    from infantposeestimation_gaussianbias_tpu.inference import PoseInference
    from infantposeestimation_gaussianbias_tpu.viz import (
        create_video_with_pose,
    )
    from infantposeestimation_gaussianbias_tpu.schemas import COCO17

    cfg = setup[0]
    cfg.temporal.enabled = True
    video = str(tmp_path / "in.mp4")
    writer = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"),
                             10.0, (96, 80))
    rng = np.random.RandomState(0)
    for _ in range(8):
        writer.write(rng.randint(0, 255, (80, 96, 3)).astype(np.uint8))
    writer.release()

    infer = PoseInference(cfg)
    traj, scores, fps = infer.predict_video(video)
    assert traj.shape == (8, 17, 2)
    assert scores.shape == (8, 17)

    out = str(tmp_path / "out.mp4")
    create_video_with_pose(video, traj, scores, out, COCO17, fps=fps)
    assert os.path.getsize(out) > 0
    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 8
    cap.release()


def test_metrics_writer(tmp_path):
    import json

    from infantposeestimation_gaussianbias_tpu.train.logging import (
        MetricsWriter,
    )

    w = MetricsWriter(str(tmp_path))
    w.write(1, {"loss": 1.5, "lr": 1e-3}, prefix="train/")
    w.write(2, {"AP": 0.7}, prefix="val/")
    w.close()
    lines = [json.loads(line) for line in open(w.path)]
    assert lines[0]["train/loss"] == 1.5
    assert lines[1]["val/AP"] == 0.7


def test_restore_then_train_step(setup, tmp_path):
    """A restored state must keep the typed optimizer structure — training
    after restore exercises it (regression: untyped restore collapsed the
    optax NamedTuples into dicts)."""
    import jax.numpy as jnp

    from infantposeestimation_gaussianbias_tpu.models import build_model
    from infantposeestimation_gaussianbias_tpu.train import (
        create_train_state,
        make_train_step,
    )
    from infantposeestimation_gaussianbias_tpu.train.checkpoint import (
        CheckpointManager,
    )

    cfg = setup[0]
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, cfg.data.keypoint_schema))
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randn(4, 64, 64, 3).astype(np.float32)),
        "keypoints": jnp.asarray(
            rng.uniform(8, 56, (4, 17, 2)).astype(np.float32)),
        "visible": jnp.ones((4, 17), jnp.float32),
    }
    state, _ = step(state, batch, jax.random.PRNGKey(1))

    mgr = CheckpointManager(str(tmp_path / "rt"), save_every=1)
    mgr.save(state, 0, {"AP": 0.1}, -np.inf)
    fresh = create_train_state(cfg, model, jax.random.PRNGKey(7))
    restored, meta = mgr.restore(fresh)
    assert int(restored.step) == 1
    assert meta["AP"] == pytest.approx(0.1)
    restored, metrics = step(restored, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(restored.step) == 2


def test_best_metric_survives_resume(setup, tmp_path):
    """Resume must not let a worse checkpoint overwrite best.pth."""
    from infantposeestimation_gaussianbias_tpu.models import build_model
    from infantposeestimation_gaussianbias_tpu.train import create_train_state
    from infantposeestimation_gaussianbias_tpu.train.checkpoint import (
        CheckpointManager,
    )

    cfg = setup[0]
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(tmp_path / "bk"), save_every=100)
    best, _ = mgr.save(state, 0, {"AP": 0.8}, -np.inf)
    assert best == 0.8

    # simulate a resume: read best back from metadata
    _, meta = mgr.restore(state)
    resumed_best = float(meta.get("best", -np.inf))
    assert resumed_best == pytest.approx(0.8)
    best2, is_best = mgr.save(state, 1, {"AP": 0.5}, resumed_best)
    assert not is_best and best2 == pytest.approx(0.8)


def test_multi_scale_training_example():
    """One parameter tree trains across the reference's three scales
    (examples/multi_scale_training.py; ref data/examples.py:435-472)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from examples.multi_scale_training import run

    _, history = run(epochs=3, steps_per_scale=1, batch_size=2,
                     verbose=False)
    assert len({s for s, _ in history}) == 3
    assert all(np.isfinite(l) for _, l in history)


def test_predict_stream_overlap(setup):
    """predict_stream (overlapped host/device serving) must yield the
    same results as running its jitted pipeline synchronously, batch for
    batch, in order."""
    import jax.numpy as jnp

    from infantposeestimation_gaussianbias_tpu.inference import PoseInference

    cfg, _, _, val_loader, _ = setup
    infer = PoseInference(cfg)

    batches = list(val_loader.epoch(0))
    streamed = list(infer.predict_stream(iter(batches), max_in_flight=2))
    assert len(streamed) == len(batches)

    fn = infer._crops_pipeline_jit()
    for batch, (coords, scores) in zip(batches, streamed):
        ref_c, ref_s = fn(infer._variables,
                          jnp.asarray(batch["image_u8"]),
                          jnp.asarray(batch["center"]),
                          jnp.asarray(batch["scale"]))
        np.testing.assert_allclose(coords, np.asarray(ref_c),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(scores, np.asarray(ref_s),
                                   rtol=1e-5, atol=1e-5)
        assert coords.shape == (8, 17, 2) and scores.shape == (8, 17)


def test_predict_stream_with_donated_inputs(setup, monkeypatch):
    """IPE_DONATE_SERVING=1: the serving jit donates the crop buffer;
    streamed results must be identical to the non-donating run (each
    batch array is consumed exactly once in predict_stream, so donation
    is semantics-preserving there)."""
    from infantposeestimation_gaussianbias_tpu.inference import PoseInference

    cfg, _, _, val_loader, _ = setup
    batches = list(val_loader.epoch(0))

    ref = list(PoseInference(cfg).predict_stream(iter(batches),
                                                 max_in_flight=2))
    monkeypatch.setenv("IPE_DONATE_SERVING", "1")
    out = list(PoseInference(cfg).predict_stream(iter(batches),
                                                 max_in_flight=2))
    assert len(out) == len(ref)
    for (c1, s1), (c2, s2) in zip(ref, out):
        np.testing.assert_allclose(c2, c1, rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(s2, s1, rtol=1e-5, atol=1e-5)

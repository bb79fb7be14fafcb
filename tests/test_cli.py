"""CLI driver tests: train/validate/infer/analyze on on-disk synthetic data."""

import json
import os

import numpy as np
import pytest

from infantposeestimation_gaussianbias_tpu.data import synthetic_coco_dataset
from infantposeestimation_gaussianbias_tpu.schemas import COCO17


@pytest.fixture(scope="module")
def disk_dataset(tmp_path_factory):
    """Synthetic COCO dataset written to disk (images + annotation json)."""
    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "val2017"
    ann_dir = root / "annotations"
    img_dir.mkdir()
    ann_dir.mkdir()
    synth = synthetic_coco_dataset(
        num_images=6, num_keypoints=17, image_dir=str(img_dir), seed=11,
        height=128, width=160, keypoint_names=COCO17.keypoint_names,
        skeleton=COCO17.skeleton)
    with open(ann_dir / "person_keypoints_val2017.json", "w") as f:
        json.dump(synth, f)
    return str(root), synth


COMMON = ["--set", "model.backbone=litehrnet", "model.head_type=heatmap",
          "model.compute_dtype=float32", "data.input_size=64,64",
          "data.heatmap_size=16,16", "eval.batch_size=4"]


def test_cli_validate(disk_dataset, capsys):
    from infantposeestimation_gaussianbias_tpu.cli.validate import main

    root, _ = disk_dataset
    main(COMMON + [f"data.data_root={root}"])
    out = capsys.readouterr().out
    assert "AP" in out and "AR" in out


def test_cli_validate_mesh(disk_dataset, capsys):
    """--mesh validates with batches sharded over the 8 virtual devices
    and rejects a batch size the device count does not divide."""
    from infantposeestimation_gaussianbias_tpu.cli.validate import main

    root, _ = disk_dataset
    base = ["--set", "model.backbone=litehrnet", "model.head_type=heatmap",
            "model.compute_dtype=float32", "data.input_size=64,64",
            "data.heatmap_size=16,16", f"data.data_root={root}"]
    main(base + ["eval.batch_size=8", "--mesh"])
    assert "AP" in capsys.readouterr().out
    with pytest.raises(SystemExit, match="divisible"):
        main(base + ["eval.batch_size=6", "--mesh"])


def test_cli_validate_hrnet_fold_and_int8(disk_dataset, capsys):
    """hrnet validate serves BN-folded by default; --int8 calibrates on
    the first val batch and serves the PTQ path."""
    from infantposeestimation_gaussianbias_tpu.cli.validate import main

    root, _ = disk_dataset
    args = ["--set", "model.backbone=hrnet_w32", "model.head_type=heatmap",
            "model.compute_dtype=float32", "data.input_size=64,64",
            "data.heatmap_size=16,16", "eval.batch_size=4",
            f"data.data_root={root}"]
    main(args)  # BN-fold path
    out = capsys.readouterr().out
    assert "AP" in out
    main(args + ["--int8"])
    out = capsys.readouterr().out
    assert "AP" in out


def test_cli_infer_image(disk_dataset, tmp_path, capsys):
    from infantposeestimation_gaussianbias_tpu.cli.infer import main

    root, synth = disk_dataset
    img = os.path.join(root, "val2017", synth["images"][0]["file_name"])
    out_img = str(tmp_path / "out.jpg")
    main(COMMON + ["--input", img, "--output", out_img])
    assert os.path.exists(out_img)
    printed = capsys.readouterr().out
    assert "nose" in printed


def test_cli_infer_image_mesh(disk_dataset, tmp_path, capsys):
    """--mesh serves over all (virtual) devices: data-parallel by
    default, model axis when a value is given."""
    from infantposeestimation_gaussianbias_tpu.cli.infer import main

    root, synth = disk_dataset
    img = os.path.join(root, "val2017", synth["images"][0]["file_name"])
    main(COMMON + ["--input", img, "--mesh"])
    assert "nose" in capsys.readouterr().out


def test_cli_infer_directory(disk_dataset, capsys):
    from infantposeestimation_gaussianbias_tpu.cli.infer import main

    root, _ = disk_dataset
    main(COMMON + ["--input", os.path.join(root, "val2017")])
    printed = capsys.readouterr().out
    assert "mean score" in printed


def test_cli_train_synthetic(tmp_path):
    from infantposeestimation_gaussianbias_tpu.cli.train import main

    main(["--synthetic", "8", "--epochs", "1", "--no-val"] + COMMON +
         [f"train.checkpoint_dir={tmp_path}/ck",
          "train.global_batch_size=4",
          f"log_dir={tmp_path}/logs"])
    assert os.path.exists(str(tmp_path / "ck" / "latest"))
    assert os.path.exists(str(tmp_path / "logs" / "metrics.jsonl"))


def test_cli_train_preemption_resume(tmp_path):
    """SIGTERM mid-training saves a 'latest' checkpoint stamped with the
    last completed epoch; a relaunch resumes and finishes the run."""
    from infantposeestimation_gaussianbias_tpu.cli.train import main
    from infantposeestimation_gaussianbias_tpu.train import loop as tl

    args = (["--synthetic", "8", "--epochs", "2", "--no-val"] + COMMON +
            [f"train.checkpoint_dir={tmp_path}/ck",
             "train.global_batch_size=4",
             f"log_dir={tmp_path}/logs"])
    tl._PREEMPTED.set()  # deterministic stand-in for a real SIGTERM
    try:
        main(args)
    finally:
        tl._PREEMPTED.clear()
    meta_path = str(tmp_path / "ck" / "latest.meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    assert meta["preempted"] == 1.0
    assert meta["epoch"] == -1  # no epoch completed: replay from epoch 0

    main(args)  # resume: must run to completion and overwrite 'latest'
    with open(meta_path) as f:
        meta = json.load(f)
    assert "preempted" not in meta
    assert meta["epoch"] == 1


def test_preemption_guard_catches_sigterm():
    """The guard installs a SIGTERM handler that sets the flag (instead of
    killing the process) and restores the previous handler on exit."""
    import signal

    from infantposeestimation_gaussianbias_tpu.train import loop as tl

    prev = signal.getsignal(signal.SIGTERM)
    try:
        with tl._PreemptionGuard():
            os.kill(os.getpid(), signal.SIGTERM)
            for _ in range(100):
                if tl._PREEMPTED.is_set():
                    break
            assert tl._PREEMPTED.is_set()
        assert signal.getsignal(signal.SIGTERM) is prev
    finally:
        tl._PREEMPTED.clear()
        signal.signal(signal.SIGTERM, prev)


def test_cli_train_profile_trace(tmp_path):
    """--profile captures an XProf trace of the requested step window
    (truncated stop when training ends inside the window)."""
    import glob

    from infantposeestimation_gaussianbias_tpu.cli.train import main

    main(["--synthetic", "8", "--epochs", "1", "--no-val",
          "--profile", "1:2"] + COMMON +
         [f"train.checkpoint_dir={tmp_path}/ck",
          "train.global_batch_size=4",
          f"log_dir={tmp_path}/logs"])
    traces = glob.glob(str(tmp_path / "logs" / "profile" / "**" /
                           "*.xplane.pb"), recursive=True)
    assert traces, "no xplane trace written by --profile"


def test_cli_tools_convert_and_analyze(tmp_path, capsys):
    import cv2

    from infantposeestimation_gaussianbias_tpu.tools.convert_to_coco import (
        main as convert_main,
    )
    from infantposeestimation_gaussianbias_tpu.tools.analyze_dataset import (
        main as analyze_main,
    )

    src = tmp_path / "raw"
    src.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        cv2.imwrite(str(src / f"img{i}.jpg"),
                    rng.randint(0, 255, (100, 120, 3)).astype(np.uint8))
        ann = {"image": f"img{i}.jpg",
               "keypoints": [[float(20 + j * 5), float(30 + j * 3), 2]
                             for j in range(13)]}
        (src / f"img{i}.json").write_text(json.dumps(ann))

    out = str(tmp_path / "coco.json")
    convert_main(["--input-dir", str(src), "--output", out, "--split"])
    assert os.path.exists(out)
    assert os.path.exists(str(tmp_path / "coco_train.json"))

    analyze_main(["--ann", out, "--out-dir", str(tmp_path / "an")])
    printed = capsys.readouterr().out
    assert "Dataset analysis" in printed
    assert os.path.exists(str(tmp_path / "an" / "visibility.png"))


def test_export_roundtrip(tmp_path):
    """Export -> deserialize -> call must match the live pipeline."""
    import jax
    import jax.numpy as jnp

    from infantposeestimation_gaussianbias_tpu.config import Config
    from infantposeestimation_gaussianbias_tpu.models import build_model
    from infantposeestimation_gaussianbias_tpu.tools.export_model import (
        build_serving_fn,
        export_pipeline,
        load_pipeline,
    )
    from infantposeestimation_gaussianbias_tpu.train.step import (
        create_train_state,
    )

    cfg = Config()
    cfg.model.backbone = "litehrnet"
    cfg.model.head_type = "heatmap"
    cfg.model.compute_dtype = "float32"
    cfg.data.input_size = (64, 64)
    cfg.data.heatmap_size = (16, 16)

    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    blob = export_pipeline(cfg, state, batch=2, frame_hw=(96, 96))
    assert len(blob) > 1000

    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 255, (2, 96, 96, 3))
                         .astype(np.uint8))
    centers = jnp.asarray(rng.uniform(30, 60, (2, 2)).astype(np.float32))
    scales = jnp.asarray(np.full((2, 2), 64.0, np.float32))

    restored = load_pipeline(blob)
    k1, s1 = restored.call(frames, centers, scales)
    serve = build_serving_fn(cfg, state, (96, 96))
    k2, s2 = jax.jit(serve)(frames, centers, scales)
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-4, atol=1e-5)


def test_export_int8_roundtrip():
    """int8 PTQ export: the artifact carries the quantized weights and
    frozen activation scales; deserialized output matches the live int8
    pipeline bit for bit given the same calibration."""
    import jax
    import jax.numpy as jnp

    from infantposeestimation_gaussianbias_tpu.config import Config
    from infantposeestimation_gaussianbias_tpu.models import build_model
    from infantposeestimation_gaussianbias_tpu.tools.export_model import (
        build_serving_fn,
        export_pipeline,
        load_pipeline,
    )
    from infantposeestimation_gaussianbias_tpu.train.step import (
        create_train_state,
    )

    cfg = Config()
    cfg.model.backbone = "hrnet_w32"
    cfg.model.head_type = "fusion"
    cfg.model.compute_dtype = "float32"
    cfg.data.input_size = (48, 64)
    cfg.data.heatmap_size = (12, 16)
    cfg.eval.flip_test = False

    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(2))
    rng = np.random.RandomState(1)
    calib = rng.randn(4, 64, 48, 3).astype(np.float32)
    blob = export_pipeline(cfg, state, batch=2, frame_hw=(96, 96),
                           quantize=True, calib_crops=calib)

    frames = jnp.asarray(rng.randint(0, 255, (2, 96, 96, 3))
                         .astype(np.uint8))
    centers = jnp.asarray(rng.uniform(30, 60, (2, 2)).astype(np.float32))
    scales = jnp.asarray(np.full((2, 2), 64.0, np.float32))

    restored = load_pipeline(blob)
    k1, s1 = restored.call(frames, centers, scales)
    serve = build_serving_fn(cfg, state, (96, 96), quantize=True,
                             calib_crops=calib)
    k2, s2 = jax.jit(serve)(frames, centers, scales)
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-5, atol=1e-5)

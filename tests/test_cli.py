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


def test_cli_infer_image(disk_dataset, tmp_path, capsys):
    from infantposeestimation_gaussianbias_tpu.cli.infer import main

    root, synth = disk_dataset
    img = os.path.join(root, "val2017", synth["images"][0]["file_name"])
    out_img = str(tmp_path / "out.jpg")
    main(COMMON + ["--input", img, "--output", out_img])
    assert os.path.exists(out_img)
    printed = capsys.readouterr().out
    assert "nose" in printed


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

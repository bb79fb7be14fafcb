"""Tests for tools (converter, analyzer) and the analysis suite."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from infantposeestimation_gaussianbias_tpu.data import synthetic_coco_dataset
from infantposeestimation_gaussianbias_tpu.schemas import (
    COCO17,
    INFANT13,
    schema_from_category,
)
from infantposeestimation_gaussianbias_tpu.tools.convert_to_coco import (
    COCOConverter,
    split_dataset,
    validate_coco_format,
)
from infantposeestimation_gaussianbias_tpu.tools.analyze_dataset import (
    DatasetAnalyzer,
)


def test_converter_bbox_from_keypoints(tmp_path):
    conv = COCOConverter(INFANT13)
    img_id = conv.add_image("a.jpg", width=640, height=480)
    kpts = [[100 + i * 5.0, 200 + i * 3.0, 2] for i in range(13)]
    conv.add_annotation(img_id, kpts)
    ann = conv.dataset["annotations"][0]
    assert ann["num_keypoints"] == 13
    x, y, w, h = ann["bbox"]
    assert x == 80 and y == 180  # min - 20 padding
    assert w == 60 + 40 and h == 36 + 40
    ok, errors = validate_coco_format(conv.dataset)
    assert ok, errors

    out = tmp_path / "ds.json"
    conv.save(str(out))
    assert json.load(open(out))["categories"][0]["keypoints"][0] == "nose"


def test_txt_parser(tmp_path):
    p = tmp_path / "ann.txt"
    p.write_text("img.jpg\n10 20 2\n30 40\n")
    parsed = COCOConverter.parse_txt_format(str(p))
    assert parsed["image"] == "img.jpg"
    assert parsed["keypoints"] == [[10.0, 20.0, 2.0], [30.0, 40.0, 2.0]]


def test_validate_catches_errors():
    bad = {"images": [{"id": 1, "file_name": "x", "width": 2, "height": 2}],
           "annotations": [{"id": 1, "image_id": 99, "category_id": 1,
                            "keypoints": [1, 2], "num_keypoints": 1,
                            "bbox": [0, 0, 1, 1]}],
           "categories": []}
    ok, errors = validate_coco_format(bad)
    assert not ok
    assert any("unknown image" in e for e in errors)
    assert any("multiple of 3" in e for e in errors)


def test_split_dataset():
    synth = synthetic_coco_dataset(num_images=20, num_keypoints=13)
    splits = split_dataset(synth, 0.8, 0.1, 0.1, seed=1)
    assert len(splits["train"]["images"]) == 16
    assert len(splits["val"]["images"]) == 2
    assert len(splits["test"]["images"]) == 2
    all_ids = set()
    for s in splits.values():
        ids = {im["id"] for im in s["images"]}
        assert not (ids & all_ids)
        all_ids |= ids
        for a in s["annotations"]:
            assert a["image_id"] in ids


def test_dataset_analyzer():
    synth = synthetic_coco_dataset(num_images=10, num_keypoints=17,
                                   keypoint_names=COCO17.keypoint_names)
    an = DatasetAnalyzer(synth)
    assert an.stats["num_images"] == 10
    assert an.stats["num_keypoints"] == 17
    report = an.text_report()
    assert "nose" in report and "BBox statistics" in report
    warns = an.quality_warnings()
    assert any("small dataset" in w for w in warns)


def test_extension_templates_and_merge():
    from infantposeestimation_gaussianbias_tpu.analysis import (
        TEMPLATES,
        COCOKeypointExtender,
        detect_keypoint_groups,
        split_group_targets,
    )

    assert TEMPLATES["face_68"]["num_keypoints"] == 68
    assert TEMPLATES["hand_21"]["num_keypoints"] == 21
    assert len(TEMPLATES["face_68"]["names"]) == 68

    ext = COCOKeypointExtender()
    cat = ext.merge_keypoint_categories(
        ["body_17", "face_68", "hand_21", "hand_21"])
    assert len(cat["keypoints"]) == 127
    assert "left_hand_wrist" in cat["keypoints"]
    assert "right_hand_wrist" in cat["keypoints"]
    # skeleton indices must stay in range
    sk = np.asarray(cat["skeleton"])
    assert sk.max() < 127

    groups = detect_keypoint_groups(cat["keypoints"])
    assert set(groups) == {"body", "face", "left_hand", "right_hand"}
    assert len(groups["face"]) == 68
    assert len(groups["left_hand"]) == 21

    kpts = np.zeros((127, 2))
    vis = np.ones(127)
    tgt = split_group_targets(kpts, vis, groups)
    assert tgt["face"]["keypoints"].shape == (68, 2)

    schema = ext.schema(1)
    assert schema.num_keypoints == 127
    # flip pairs found for hands and body
    assert len(schema.flip_pairs) > 20


def test_schema_from_category_flip_pairs():
    cat = {"name": "t", "keypoints": ["nose", "left_eye", "right_eye",
                                      "left_wrist", "right_wrist"],
           "skeleton": [[0, 1], [0, 2]]}
    s = schema_from_category(cat)
    assert (1, 2) in s.flip_pairs
    assert (3, 4) in s.flip_pairs
    idx = s.flip_index()
    assert idx[1] == 2 and idx[3] == 4 and idx[0] == 0


def test_introspection_suite():
    from infantposeestimation_gaussianbias_tpu.analysis import (
        activation_statistics,
        capture_activations,
        confidence_calibration,
        count_parameters,
        error_distribution,
        grad_cam,
        mc_droppath_uncertainty,
        occlusion_sensitivity,
        parameter_summary,
        saliency_map,
    )
    from infantposeestimation_gaussianbias_tpu.models import PoseEstimator

    model = PoseEstimator(backbone_name="litehrnet", head_type="heatmap",
                          num_keypoints=5)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, False)

    n = count_parameters(variables["params"])
    assert n > 1000
    summary = parameter_summary(variables["params"], top=5)
    assert "total parameters" in summary

    acts = capture_activations(model, variables, x)
    assert len(acts) > 5
    stats = activation_statistics(acts)
    assert all("mean" in v for v in stats.values())

    sal = saliency_map(model, variables, np.zeros((32, 32, 3)), keypoint=0)
    assert sal.shape == (32, 32)

    occ = occlusion_sensitivity(model, variables, np.zeros((32, 32, 3)),
                                keypoint=0, patch=16, stride=16)
    assert occ.shape == (2, 2)

    cam = grad_cam(model, variables, np.zeros((32, 32, 3)), keypoint=0)
    assert cam.ndim == 2 and cam.max() <= 1.0

    rng = np.random.RandomState(0)
    err = error_distribution(rng.randn(4, 5, 2), rng.randn(4, 5, 2),
                             np.ones((4, 5)))
    assert np.isfinite(err["overall_mean"])

    cal = confidence_calibration(rng.uniform(0, 1, 100),
                                 rng.randint(0, 2, 100))
    assert 0 <= cal["ece"] <= 1

    unc = mc_droppath_uncertainty(model, variables, x, n_samples=3)
    assert unc["mean"].shape == unc["std"].shape


def test_plots_smoke(tmp_path):
    from infantposeestimation_gaussianbias_tpu.analysis.plots import (
        plot_accuracy_heatmap,
        plot_calibration,
        plot_error_histogram,
        plot_gradient_flow,
        plot_pck_curves,
        plot_pr_curve,
        plot_training_curves,
    )
    from infantposeestimation_gaussianbias_tpu.analysis import (
        confidence_calibration,
    )
    from infantposeestimation_gaussianbias_tpu.viz.clinical import (
        plot_confidence_over_time,
        plot_joint_position_heatmaps,
        plot_pseudo_3d_pose,
    )
    from infantposeestimation_gaussianbias_tpu.schemas import INFANT13

    rng = np.random.RandomState(0)
    gt = rng.uniform(0, 100, (8, 17, 2))
    pred = gt + rng.randn(8, 17, 2) * 3
    mask = np.ones((8, 17))
    norm = np.full(8, 100.0)
    plot_pck_curves(pred, gt, mask, norm, COCO17.keypoint_names,
                    out_path=str(tmp_path / "pck.png"))
    plot_accuracy_heatmap(rng.uniform(0, 1, 17), COCO17.keypoint_names,
                          out_path=str(tmp_path / "acc.png"))
    plot_error_histogram(np.abs(rng.randn(8, 17)), mask,
                         out_path=str(tmp_path / "err.png"))
    plot_pr_curve(rng.uniform(0, 1, 100), rng.randint(0, 2, 100),
                  out_path=str(tmp_path / "pr.png"))
    cal = confidence_calibration(rng.uniform(0, 1, 100),
                                 rng.randint(0, 2, 100))
    plot_calibration(cal, out_path=str(tmp_path / "cal.png"))

    jl = tmp_path / "metrics.jsonl"
    jl.write_text('{"step": 1, "time": 0, "loss": 1.0}\n'
                  '{"step": 2, "time": 1, "loss": 0.5}\n')
    plot_training_curves(str(jl), out_path=str(tmp_path / "curves.png"))
    plot_gradient_flow({"a/kernel": 1.0, "b/kernel": 0.1},
                       out_path=str(tmp_path / "gf.png"))

    traj = rng.uniform(0, 100, (30, 13, 2))
    scores = rng.uniform(0, 1, (30, 13))
    plot_pseudo_3d_pose(traj[0], scores[0], INFANT13,
                        out_path=str(tmp_path / "p3d.png"))
    plot_joint_position_heatmaps(traj, INFANT13,
                                 out_path=str(tmp_path / "jh.png"))
    plot_confidence_over_time(scores, 30.0, INFANT13,
                              out_path=str(tmp_path / "conf.png"))
    assert (tmp_path / "pck.png").exists()
    assert (tmp_path / "p3d.png").exists()


def test_weight_and_gradient_statistics(tmp_path):
    """WeightAnalyzer/gradient-stats parity additions
    (ref advanced_analysis.py:153-312)."""
    from infantposeestimation_gaussianbias_tpu.analysis import (
        gradient_statistics,
        weight_statistics,
    )
    from infantposeestimation_gaussianbias_tpu.analysis.plots import (
        plot_gradient_statistics,
        plot_weight_distribution,
    )
    from infantposeestimation_gaussianbias_tpu.models import PoseEstimator

    model = PoseEstimator(backbone_name="litehrnet", head_type="heatmap",
                          num_keypoints=5)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, False)

    stats = weight_statistics(variables["params"])
    assert stats["overall"]["n"] > 1000
    assert stats["per_layer"] and all(
        k.endswith("kernel") for k in stats["per_layer"])
    # kaiming-normal init: the Q-Q fit against a normal must be strong
    assert stats["qq"]["r"] > 0.9
    # sparsity is monotone in the threshold
    levels = sorted(stats["sparsity"])
    vals = [stats["sparsity"][t] for t in levels]
    assert all(a <= b + 1e-12 for a, b in zip(vals, vals[1:]))

    p = tmp_path / "weights.png"
    plot_weight_distribution(stats, str(p))
    assert p.exists() and p.stat().st_size > 0

    # gradient statistics from a real grad tree
    def loss(params):
        out = model.apply({**variables, "params": params}, x, False)
        return jnp.mean(out["heatmaps"] ** 2)

    grads = jax.grad(loss)(variables["params"])
    gstats = gradient_statistics(grads)
    assert gstats and all(
        set(v) == {"mean", "std", "min", "max", "norm"}
        for v in gstats.values())
    p2 = tmp_path / "grads.png"
    plot_gradient_statistics(gstats, str(p2))
    assert p2.exists() and p2.stat().st_size > 0


def test_feature_map_grid(tmp_path):
    """FeatureVisualizer grid (ref nn_quantitative_viz.py:255-358)."""
    from infantposeestimation_gaussianbias_tpu.analysis import (
        capture_activations,
    )
    from infantposeestimation_gaussianbias_tpu.analysis.plots import (
        plot_feature_maps,
    )
    from infantposeestimation_gaussianbias_tpu.models import PoseEstimator

    model = PoseEstimator(backbone_name="litehrnet", head_type="heatmap",
                          num_keypoints=5)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, False)
    acts = capture_activations(model, variables, x)
    layer = next(k for k, v in acts.items() if np.asarray(v).ndim == 4)
    p = tmp_path / "fmaps.png"
    plot_feature_maps(acts, layer, str(p), max_channels=9)
    assert p.exists() and p.stat().st_size > 0


def test_validate_reference_checkpoint_dry_run(capsys):
    """The one-command reference-.pth parity validator runs end to end on
    synthetic fixtures: torch-layout checkpoint -> import -> flip-test
    validate -> COCOeval -> comparison table vs the reference's claims."""
    pytest.importorskip("torch")
    from infantposeestimation_gaussianbias_tpu.tools import (
        validate_reference_checkpoint as vrc,
    )

    results = vrc.main(["--dry-run", "--batch-size", "2"])
    out = capsys.readouterr().out
    assert "reference" in out and "delta" in out
    assert set(results) >= {"AP", "AP50", "AP75"}

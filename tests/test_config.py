"""Config system tests: variants, YAML round-trip, overrides."""

import pytest

from infantposeestimation_gaussianbias_tpu.config import (
    Config,
    apply_overrides,
    get_variant,
    load_yaml,
    save_yaml,
    to_dict,
)


def test_default_matches_reference_contract():
    cfg = Config()
    assert cfg.data.input_size == (192, 256)
    assert cfg.data.heatmap_size == (48, 64)
    assert cfg.data.num_keypoints == 17
    assert cfg.data.sigma == 2.0
    assert cfg.train.lr == 5e-4
    assert cfg.train.warmup_lr == 5e-7
    assert cfg.train.lr_milestones == (170, 200)
    assert cfg.train.max_epochs == 210
    # six fusion loss weights (ref configs/config.py:63-72)
    m = cfg.model
    assert (m.heatmap_loss_weight, m.offset_loss_weight, m.peak_loss_weight,
            m.variance_loss_weight, m.overlap_loss_weight,
            m.shape_loss_weight) == (1.0, 1.0, 0.5, 0.1, 0.05, 0.05)


def test_preemie_variant():
    cfg = get_variant("preemie")
    assert cfg.data.schema == "infant13"
    assert cfg.data.num_keypoints == 13
    assert cfg.data.sigma == 1.5
    assert cfg.data.heatmap_size == (128, 128)
    assert cfg.data.rotation_factor == 15.0
    assert cfg.model.morph_weight == 0.15
    assert cfg.eval.fusion_alpha == 0.4
    assert cfg.clinical.enabled


def test_all_variants_construct():
    for name in ("default", "hrnet_w32", "hrnet_w48", "hrformer_base",
                 "hrformer_small", "lightweight", "preemie",
                 "hrnet_w48_384", "hrformer_base_384"):
        cfg = get_variant(name)
        assert cfg.exp_name


def test_384_variants_match_reference_resolution():
    """High-res rows of the reference AP table
    (/root/reference/README.md:227-229): 384x288 input, 96x72 heatmaps."""
    for name in ("hrnet_w48_384", "hrformer_base_384"):
        cfg = get_variant(name)
        assert tuple(cfg.data.input_size) == (288, 384)   # (W, H)
        assert tuple(cfg.data.heatmap_size) == (72, 96)
        assert "384x288" in cfg.exp_name


def test_yaml_roundtrip(tmp_path):
    cfg = get_variant("preemie")
    cfg.train.lr = 1.25e-3
    path = str(tmp_path / "cfg.yaml")
    save_yaml(cfg, path)
    cfg2 = load_yaml(path)
    assert to_dict(cfg) == to_dict(cfg2)
    assert cfg2.data.schema == "infant13"
    assert cfg2.train.lr == 1.25e-3


def test_overrides():
    cfg = Config()
    apply_overrides(cfg, ["train.lr=1e-3", "model.backbone=hrformer_base",
                          "data.input_size=288,384",
                          "eval.flip_test=false",
                          "train.lr_milestones=100 150"])
    assert cfg.train.lr == 1e-3
    assert cfg.model.backbone == "hrformer_base"
    assert cfg.data.input_size == (288, 384)
    assert cfg.eval.flip_test is False
    assert cfg.train.lr_milestones == (100, 150)


def test_override_errors():
    cfg = Config()
    with pytest.raises(AttributeError):
        apply_overrides(cfg, ["train.nonexistent=1"])
    with pytest.raises(ValueError):
        apply_overrides(cfg, ["no_equals_sign"])


def test_unknown_yaml_key(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("train:\n  bogus_field: 1\n")
    with pytest.raises(KeyError):
        load_yaml(str(p))

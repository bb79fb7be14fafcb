"""Multi-host wiring units: record sharding, pad-flag masking, gathers.

Real multi-process JAX cannot run in this environment, so these tests pin
the host-side contracts: equalized per-process record shards, the _pad
flag flowing through the loader into the valid mask, and the gather
helpers being exact identities on a single host (the multi-device /
multi-host device path itself is exercised by tests/test_train.py and
__graft_entry__.dryrun_multichip)."""

import numpy as np

import jax
import jax.numpy as jnp

from infantposeestimation_gaussianbias_tpu.parallel import (
    allgather_host_values,
    host_local_rows,
    process_shard,
)
from infantposeestimation_gaussianbias_tpu.data.pipeline import _collate


def recs(n):
    return [{"i": i} for i in range(n)]


class TestProcessShard:
    def test_single_host_identity(self):
        r = recs(7)
        assert process_shard(r, 0, 1) == r

    def test_strided_split_covers_everything(self):
        r = recs(10)
        shards = [process_shard(r, p, 4, equalize="pad") for p in range(4)]
        seen = sorted(x["i"] for s in shards for x in s
                      if not x.get("_pad"))
        assert seen == list(range(10))

    def test_truncate_equalizes(self):
        r = recs(10)
        shards = [process_shard(r, p, 4) for p in range(4)]
        assert all(len(s) == 10 // 4 for s in shards)
        for s in shards:
            assert not any(x.get("_pad") for x in s)

    def test_pad_equalizes_and_flags(self):
        r = recs(10)
        shards = [process_shard(r, p, 4, equalize="pad") for p in range(4)]
        target = -(-10 // 4)
        assert all(len(s) == target for s in shards)
        n_pad = sum(bool(x.get("_pad")) for s in shards for x in s)
        assert n_pad == 4 * target - 10
        # padded entries duplicate the shard's own last real record
        for s in shards:
            for x in s:
                if x.get("_pad"):
                    assert x["i"] == s[0]["i"] or any(
                        y["i"] == x["i"] and not y.get("_pad") for y in s)

    def test_unknown_mode_raises(self):
        import pytest

        with pytest.raises(ValueError):
            process_shard(recs(4), 0, 2, equalize="bogus")


class TestPadFlagThroughCollate:
    def test_pad_records_are_invalid(self):
        samples = [
            {"x": np.zeros(3, np.float32), "pad": np.float32(0)},
            {"x": np.ones(3, np.float32), "pad": np.float32(1)},
        ]
        batch = _collate(samples, pad_to=4)
        np.testing.assert_array_equal(batch["valid"], [1, 0, 0, 0])
        assert "pad" not in batch

    def test_no_pad_key_defaults_valid(self):
        samples = [{"x": np.zeros(3, np.float32)} for _ in range(2)]
        batch = _collate(samples, pad_to=2)
        np.testing.assert_array_equal(batch["valid"], [1, 1])


class TestGatherHelpers:
    def test_allgather_identity_single_process(self):
        tree = {"a": np.arange(6).reshape(2, 3), "b": np.ones(4)}
        out = allgather_host_values(tree)
        assert out is tree  # exact identity on one host

    def test_host_local_rows_full_array(self):
        x = jnp.arange(12.0).reshape(4, 3)
        np.testing.assert_array_equal(host_local_rows(x), np.asarray(x))


def test_build_dataloader_single_host_batch_unchanged(tmp_path):
    import json

    from infantposeestimation_gaussianbias_tpu.config import Config
    from infantposeestimation_gaussianbias_tpu.data import (
        synthetic_coco_dataset,
    )
    from infantposeestimation_gaussianbias_tpu.data.pipeline import (
        build_dataloader,
    )
    from infantposeestimation_gaussianbias_tpu.schemas import COCO17

    root = tmp_path / "coco"
    (root / "val2017").mkdir(parents=True)
    (root / "annotations").mkdir()
    synth = synthetic_coco_dataset(
        num_images=5, num_keypoints=17, image_dir=str(root / "val2017"),
        seed=3, height=96, width=128,
        keypoint_names=COCO17.keypoint_names, skeleton=COCO17.skeleton)
    with open(root / "annotations" / "person_keypoints_val2017.json",
              "w") as f:
        json.dump(synth, f)

    cfg = Config()
    cfg.data.data_root = str(root)
    cfg.eval.batch_size = 4
    loader = build_dataloader(cfg, is_train=False)
    assert loader.batch_size == 4  # process_count == 1: unchanged
    batches = list(loader.epoch(0))
    assert sum(int(b["valid"].sum()) for b in batches) == 5

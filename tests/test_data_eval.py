"""Data pipeline + evaluator tests on synthetic COCO data."""

import numpy as np
import pytest

from infantposeestimation_gaussianbias_tpu.config import Config
from infantposeestimation_gaussianbias_tpu.data import (
    CocoIndex,
    DataLoader,
    PoseDataset,
    build_records,
    synthetic_coco_dataset,
)
from infantposeestimation_gaussianbias_tpu.data.transforms import (
    affine_matrix_np,
    compose_flip,
)
from infantposeestimation_gaussianbias_tpu.eval import (
    COCOEvaluator,
    calculate_movement_amplitude,
    calculate_temporal_consistency,
    compute_oks,
    pck_accuracy,
)
from infantposeestimation_gaussianbias_tpu.schemas import COCO17


@pytest.fixture
def synth():
    return synthetic_coco_dataset(num_images=6, num_keypoints=17, seed=3)


def _image_cache(dataset_dict, seed=3, height=256, width=320):
    rng = np.random.RandomState(seed)
    cache = {}
    for im in dataset_dict["images"]:
        cache[im["file_name"]] = rng.randint(
            0, 255, (height, width, 3)).astype(np.uint8)
    return cache


def test_coco_index_and_records(synth):
    index = CocoIndex(dataset=synth)
    assert len(index.get_img_ids()) == 6
    assert index.num_keypoints == 17
    recs = build_records(index, bbox_padding=1.25)
    assert len(recs) == 6
    r = recs[0]
    assert r["keypoints"].shape == (17, 2)
    # scale = clipped bbox * 1.25
    bbox = r["bbox"]
    np.testing.assert_allclose(r["scale"],
                               (bbox[2:] - bbox[:2]) * 1.25, rtol=1e-5)


def test_loader_batches(synth):
    cfg = Config()
    cfg.data.input_size = (64, 64)
    cfg.data.heatmap_size = (16, 16)
    index = CocoIndex(dataset=synth)
    recs = build_records(index)
    ds = PoseDataset(cfg, recs, "", is_train=True,
                     image_cache=_image_cache(synth))
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=0)
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    b = batches[0]
    assert b["image_u8"].shape == (4, 64, 64, 3)
    assert b["keypoints"].shape == (4, 17, 2)
    assert b["valid"].sum() == 4
    # last batch padded to fixed shape
    assert batches[1]["image_u8"].shape == (4, 64, 64, 3)
    assert batches[1]["valid"].sum() == 2


def test_loader_determinism(synth):
    cfg = Config()
    cfg.data.input_size = (64, 64)
    index = CocoIndex(dataset=synth)
    recs = build_records(index)
    cache = _image_cache(synth)
    ds = PoseDataset(cfg, recs, "", is_train=True, image_cache=cache)
    a = ds.get(2, epoch=1, seed=42)
    b = ds.get(2, epoch=1, seed=42)
    np.testing.assert_array_equal(a["image_u8"], b["image_u8"])
    np.testing.assert_array_equal(a["keypoints"], b["keypoints"])
    c = ds.get(2, epoch=2, seed=42)
    assert not np.array_equal(a["keypoints"], c["keypoints"])


def test_compose_flip_matches_flipped_warp():
    """Warping the original image with the composed matrix must equal
    warping the flipped image with the plain matrix."""
    import cv2

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (120, 160, 3)).astype(np.uint8)
    center = np.array([100.0, 60.0], np.float32)
    scale = np.array([80.0, 80.0], np.float32)
    mat = affine_matrix_np(center, scale, (64, 64), 15.0)

    flipped = img[:, ::-1].copy()
    ref = cv2.warpAffine(flipped, mat.astype(np.float64), (64, 64))
    mat_c = compose_flip(mat, img.shape[1])
    ours = cv2.warpAffine(img, mat_c.astype(np.float64), (64, 64))
    assert np.mean(np.abs(ours.astype(float) - ref.astype(float))) < 1.0


def test_evaluator_perfect_predictions(synth):
    """Feeding GT keypoints as predictions must give AP = 1.0."""
    ev = COCOEvaluator(COCO17.oks_sigma_array(), gt_dataset=synth)
    for ann in synth["annotations"]:
        kpts = np.asarray(ann["keypoints"]).reshape(-1, 3)
        ev.update([ann["image_id"]], kpts[None, :, :2],
                  np.ones((1, 17)))
    res = ev.evaluate()
    assert res["AP"] == pytest.approx(1.0)
    assert res["AP50"] == pytest.approx(1.0)
    assert res["AR"] == pytest.approx(1.0)
    assert ev.simple_ap() == pytest.approx(1.0)


def test_evaluator_perturbed_predictions(synth):
    """Small perturbations keep AP50 high; huge ones destroy AP."""
    rng = np.random.RandomState(0)
    areas = {a["image_id"]: a["area"] for a in synth["annotations"]}

    def run(noise_frac):
        ev = COCOEvaluator(COCO17.oks_sigma_array(), gt_dataset=synth)
        for ann in synth["annotations"]:
            kpts = np.asarray(ann["keypoints"], float).reshape(-1, 3)
            s = np.sqrt(areas[ann["image_id"]])
            noisy = kpts[:, :2] + rng.randn(17, 2) * s * noise_frac
            ev.update([ann["image_id"]], noisy[None],
                      np.ones((1, 17)))
        return ev.evaluate()

    good = run(0.01)
    bad = run(1.0)
    assert good["AP50"] > 0.9
    assert bad["AP"] < 0.2
    assert good["AP"] > bad["AP"]


def test_oks_identity_and_falloff():
    rng = np.random.RandomState(0)
    kpts = np.concatenate([rng.uniform(0, 100, (17, 2)),
                           np.full((17, 1), 2.0)], 1)
    sig = COCO17.oks_sigma_array()
    same = compute_oks(kpts, 2500.0, kpts[None, :, :2], sig,
                       np.array([0, 0, 100, 100.0]))
    assert same[0] == pytest.approx(1.0)
    off = compute_oks(kpts, 2500.0, kpts[None, :, :2] + 5.0, sig,
                      np.array([0, 0, 100, 100.0]))
    assert 0 < off[0] < 1.0


def test_pck_and_clinical_metrics():
    rng = np.random.RandomState(0)
    gt = rng.uniform(0, 100, (4, 13, 2))
    pred = gt + rng.randn(4, 13, 2) * 1.0
    mask = np.ones((4, 13))
    norm = np.full(4, 100.0)
    res = pck_accuracy(pred, gt, mask, norm, 0.2)
    assert res["pck"] > 0.99

    t = np.linspace(0, 2 * np.pi, 50)
    traj = np.zeros((50, 13, 2))
    traj[:, 9, 0] = 20 * np.sin(t)  # left wrist swings
    amp = calculate_movement_amplitude(traj, fps=30.0)
    assert amp["amplitude"][9] == pytest.approx(40.0, rel=0.01)
    assert amp["amplitude"][0] == 0.0

    smooth = calculate_temporal_consistency(traj)
    noisy = calculate_temporal_consistency(
        traj + np.random.RandomState(1).randn(50, 13, 2) * 5)
    assert smooth > noisy


def test_postprocess_toolbox():
    import jax.numpy as jnp

    from infantposeestimation_gaussianbias_tpu.postprocess import (
        filter_low_confidence,
        nms_pose,
        postprocess_predictions,
    )

    rng = np.random.RandomState(0)
    preds = jnp.asarray(rng.uniform(0, 100, (2, 13, 2)).astype(np.float32))
    conf = jnp.asarray(rng.uniform(0, 1, (2, 13)).astype(np.float32))
    out, mask = filter_low_confidence(preds, conf, 0.5)
    assert np.all(np.asarray(out)[np.asarray(conf) <= 0.5] == 0)

    # NMS: two keypoints 1px apart, keep the more confident
    pts = np.zeros((1, 3, 2), np.float32)
    pts[0, 1] = [1.0, 0.0]
    pts[0, 2] = [50.0, 50.0]
    cf = np.array([[0.4, 0.9, 0.8]], np.float32)
    kept, keep = nms_pose(jnp.asarray(pts), jnp.asarray(cf), 5.0)
    keep = np.asarray(keep)[0]
    assert not keep[0] and keep[1] and keep[2]

    hm = rng.uniform(0, 1, (2, 64, 64, 13)).astype(np.float32)
    meta = {
        "center": jnp.asarray(rng.uniform(100, 200, (2, 2)).astype(np.float32)),
        "scale": jnp.asarray(rng.uniform(100, 300, (2, 2)).astype(np.float32)),
    }
    res = postprocess_predictions(
        {"heatmaps": jnp.asarray(hm),
         "coords": jnp.asarray(rng.uniform(0, 1, (2, 13, 2)).astype(np.float32))},
        meta)
    assert res["preds"].shape == (2, 13, 2)
    assert res["mask"].shape == (2, 13)


def test_loader_propagates_errors(synth):
    cfg = Config()
    cfg.data.input_size = (64, 64)
    index = CocoIndex(dataset=synth)
    recs = build_records(index)
    # no image cache + nonexistent root -> load must raise in the consumer
    ds = PoseDataset(cfg, recs, "/nonexistent", is_train=False)
    loader = DataLoader(ds, batch_size=4, shuffle=False)
    with pytest.raises(ValueError, match="Failed to load image"):
        next(loader.epoch(0))


def test_prefetch_to_device_transfers_and_propagates_errors():
    """The H2D prefetch stage must transfer selected keys, pass others
    through, preserve order, and re-raise producer exceptions in the
    consumer thread."""
    import jax.numpy as jnp

    from infantposeestimation_gaussianbias_tpu.data.pipeline import (
        prefetch_to_device,
    )

    batches = [{"image_u8": np.full((2, 4, 4, 3), i, np.uint8),
                "meta": f"b{i}"} for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2,
                                  keys=("image_u8",)))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert isinstance(b["image_u8"], jnp.ndarray)
        assert int(b["image_u8"][0, 0, 0, 0]) == i  # order preserved
        assert b["meta"] == f"b{i}"  # passthrough untouched

    def bad():
        yield batches[0]
        raise RuntimeError("producer blew up")

    it = prefetch_to_device(bad(), size=2, keys=("image_u8",))
    next(it)
    with pytest.raises(RuntimeError, match="producer blew up"):
        list(it)


def test_prefetch_to_device_abandoned_stream_stops_transfer_thread():
    """A consumer that abandons the stream mid-flight (break / downstream
    error) must not leak the transfer thread: with the queue full, the
    thread would otherwise park forever in a blocking put, pinning
    device-committed batches."""
    import threading
    import time

    from infantposeestimation_gaussianbias_tpu.data.pipeline import (
        prefetch_to_device,
    )

    before = {t.ident for t in threading.enumerate()}
    batches = ({"image_u8": np.zeros((2, 4, 4, 3), np.uint8)}
               for _ in range(50))
    it = prefetch_to_device(batches, size=1, keys=("image_u8",))
    next(it)   # queue now full, thread blocked in put
    it.close()  # consumer abandons -> generator finally sets stop
    deadline = time.time() + 5.0
    while time.time() < deadline:
        leaked = [t for t in threading.enumerate()
                  if t.ident not in before and t.is_alive()]
        if not leaked:
            break
        time.sleep(0.05)
    assert not leaked, f"transfer thread leaked: {leaked}"

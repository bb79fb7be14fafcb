"""Full-pipeline proof: train on a LEARNABLE synthetic task and measure AP.

Renders images where every keypoint is a visually distinct colored disk
(hue-coded by joint), so a pose model can genuinely learn localization.
Runs the COMPLETE production path — host loader with augmentation, fused
train step on device, flip-test validation, COCOeval OKS/AP — and asserts
the final AP clears a threshold.  This is the framework's strongest
self-contained correctness evidence absent real COCO data: a broken
augmentation, target, decode, back-projection, or evaluator step all
destroy AP.

Round-1 result on v5e: see BENCH.md.

Run: python -m infantposeestimation_gaussianbias_tpu.tools.pipeline_proof
"""

from __future__ import annotations

import colorsys
from typing import Dict, Tuple

import numpy as np


def render_pose_image(rng: np.random.RandomState, num_kpts: int,
                      height: int, width: int
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Noise background + one hue-coded disk per keypoint."""
    img = rng.randint(0, 60, (height, width, 3)).astype(np.uint8)
    kpts = np.zeros((num_kpts, 3), np.float32)
    yy, xx = np.mgrid[0:height, 0:width]
    for k in range(num_kpts):
        x = rng.uniform(20, width - 20)
        y = rng.uniform(20, height - 20)
        rgb = np.array(colorsys.hsv_to_rgb(k / num_kpts, 1.0, 1.0)) * 255
        mask = (xx - x) ** 2 + (yy - y) ** 2 < 8.0**2
        img[mask] = rgb.astype(np.uint8)
        kpts[k] = (x, y, 2.0)
    return img, kpts


def build_synthetic_pose_dataset(n: int, num_kpts: int = 17,
                                 height: int = 192, width: int = 256,
                                 seed: int = 0
                                 ) -> Tuple[Dict, Dict[str, np.ndarray]]:
    """COCO dict + in-memory image cache for the rendered task."""
    from ..schemas import COCO17

    rng = np.random.RandomState(seed)
    images, annotations, cache = [], [], {}
    for i in range(n):
        img, kpts = render_pose_image(rng, num_kpts, height, width)
        name = f"proof_{i:05d}.jpg"
        cache[name] = img
        x1, y1 = kpts[:, 0].min() - 12, kpts[:, 1].min() - 12
        x2, y2 = kpts[:, 0].max() + 12, kpts[:, 1].max() + 12
        x1, y1 = max(0, x1), max(0, y1)
        x2, y2 = min(width - 1, x2), min(height - 1, y2)
        images.append({"id": i + 1, "file_name": name,
                       "width": width, "height": height})
        annotations.append({
            "id": i + 1, "image_id": i + 1, "category_id": 1,
            "keypoints": kpts.reshape(-1).tolist(),
            "num_keypoints": num_kpts,
            "bbox": [float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
            "area": float((x2 - x1) * (y2 - y1)),
            "iscrowd": 0,
        })
    cat = {"id": 1, "name": "person", "supercategory": "person",
           "keypoints": list(COCO17.keypoint_names)[:num_kpts],
           "skeleton": [list(e) for e in COCO17.skeleton
                        if e[0] < num_kpts and e[1] < num_kpts]}
    return ({"images": images, "annotations": annotations,
             "categories": [cat]}, cache)


def run(train_images: int = 64, epochs: int = 400, ap_threshold: float = 0.5,
        backbone: str = "litehrnet", head_type: str = "heatmap",
        lr: float = 2e-3, save_checkpoints: bool = True,
        quantize: bool = False, max_quant_ap_drop: float = 0.03,
        verbose: bool = True) -> float:
    import jax

    from ..config import Config
    from ..data import CocoIndex, DataLoader, PoseDataset, build_records
    from ..train.loop import train, validate

    cfg = Config()
    cfg.model.backbone = backbone
    cfg.model.head_type = head_type
    cfg.model.compute_dtype = "bfloat16"
    cfg.data.input_size = (128, 128)
    cfg.data.heatmap_size = (32, 32)
    cfg.data.rotation_factor = 15.0
    cfg.data.scale_factor = (0.8, 1.2)
    cfg.data.half_body_prob = 0.0
    cfg.train.global_batch_size = 16
    cfg.eval.batch_size = 16
    cfg.train.lr = lr
    cfg.train.warmup_epochs = 5
    cfg.train.lr_milestones = (int(epochs * 0.7), int(epochs * 0.9))
    cfg.train.val_interval = 10**9
    cfg.train.log_interval = 10**9  # per-epoch logs suffice
    import shutil
    cfg.train.checkpoint_dir = "/tmp/pipeline_proof_ckpt"
    shutil.rmtree(cfg.train.checkpoint_dir, ignore_errors=True)
    if not save_checkpoints:
        cfg.train.save_every = 0
        cfg.train.save_latest_interval = 0

    synth, cache = build_synthetic_pose_dataset(train_images)
    recs = build_records(CocoIndex(dataset=synth))
    train_loader = DataLoader(
        PoseDataset(cfg, recs, "", True, image_cache=cache),
        cfg.train.global_batch_size, shuffle=True, seed=0, drop_last=True)
    val_loader = DataLoader(
        PoseDataset(cfg, recs, "", False, image_cache=cache),
        cfg.eval.batch_size, shuffle=False)

    state = train(cfg, train_loader, max_epochs=epochs, use_mesh=False)
    results = validate(cfg, state, val_loader, synth, with_loss=False)
    if verbose:
        print({k: round(v, 4) for k, v in results.items()})
    assert results["AP"] >= ap_threshold, \
        f"pipeline proof failed: AP {results['AP']:.3f} < {ap_threshold}"

    if quantize:
        # int8 PTQ AP-delta guard: quantize the trained model (calibrating
        # on augment-free val crops) and re-run the identical flip-test
        # validation; serving in int8 must not cost meaningful AP.
        from types import SimpleNamespace

        from ..data.pipeline import device_batch
        from ..models import build_model, quantize_model

        calib = []
        for batch in val_loader.epoch(0):
            calib.append(device_batch(batch, cfg.data.pixel_mean,
                                      cfg.data.pixel_std)["image"])
            if len(calib) >= 4:
                break
        qvars = quantize_model(cfg, state.variables, calib)
        qmodel = build_model(cfg, quant=True)
        qstate = SimpleNamespace(apply_fn=qmodel.apply, variables=qvars)
        q_results = validate(cfg, qstate, val_loader, synth, with_loss=False)
        if verbose:
            print({f"int8_{k}": round(v, 4) for k, v in q_results.items()})
        drop = results["AP"] - q_results["AP"]
        assert drop <= max_quant_ap_drop, \
            f"int8 AP drop {drop:.4f} > {max_quant_ap_drop} " \
            f"(float {results['AP']:.4f} vs int8 {q_results['AP']:.4f})"
        return q_results["AP"]
    return results["AP"]


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--backbone", default="litehrnet")
    p.add_argument("--head", default="heatmap")
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--ap-threshold", type=float, default=0.5)
    p.add_argument("--no-checkpoints", action="store_true")
    p.add_argument("--quantize", action="store_true",
                   help="also validate the int8 PTQ model and assert the "
                        "AP drop stays within --max-quant-ap-drop")
    p.add_argument("--max-quant-ap-drop", type=float, default=0.03)
    a = p.parse_args()
    run(epochs=a.epochs, ap_threshold=a.ap_threshold, backbone=a.backbone,
        head_type=a.head, lr=a.lr, save_checkpoints=not a.no_checkpoints,
        quantize=a.quantize, max_quant_ap_drop=a.max_quant_ap_drop)

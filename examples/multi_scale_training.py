"""Multi-scale training example (reference data/examples.py:435-472).

The reference builds one augmentation pipeline per input scale and picks
one at random per iteration.  The TPU-native version keeps XLA's static
shapes: a FIXED scale set, one fused train step compiled per scale
(cached after the first epoch at each scale), cycled per epoch.  The
backbone + heads are fully convolutional, so one parameter tree serves
every scale — the same model genuinely trains at (128,192), (192,256),
(256,320) like the reference example intends.

Run: python examples/multi_scale_training.py [--steps-per-scale N]
"""

from __future__ import annotations

import argparse
import copy

import numpy as np

import jax

from infantposeestimation_gaussianbias_tpu.config import Config
from infantposeestimation_gaussianbias_tpu.data import (
    CocoIndex,
    DataLoader,
    PoseDataset,
    build_records,
    synthetic_coco_dataset,
)
from infantposeestimation_gaussianbias_tpu.data.pipeline import device_batch
from infantposeestimation_gaussianbias_tpu.models import build_model
from infantposeestimation_gaussianbias_tpu.train.step import (
    create_train_state,
    make_train_step,
)

# (W, H) like the reference example's small / medium / large
SCALES = ((128, 192), (192, 256), (256, 320))


def scale_cfg(base: Config, input_size) -> Config:
    cfg = copy.deepcopy(base)
    cfg.data.input_size = tuple(input_size)
    cfg.data.heatmap_size = (input_size[0] // 4, input_size[1] // 4)
    return cfg


def run(epochs: int = 3, steps_per_scale: int = 4, batch_size: int = 4,
        backbone: str = "litehrnet", scales=SCALES, seed: int = 0,
        verbose: bool = True):
    base = Config()
    base.model.backbone = backbone
    base.model.head_type = "heatmap"
    base.model.compute_dtype = "float32"
    base.train.global_batch_size = batch_size

    # one loader + one fused step per scale; ONE shared model/state
    synth = synthetic_coco_dataset(num_images=batch_size * 2, height=320,
                                   width=320, seed=seed)
    recs = build_records(CocoIndex(dataset=synth))
    cfgs = [scale_cfg(base, s) for s in scales]
    loaders = [DataLoader(PoseDataset(c, recs, "", True,
                                      image_cache=_cache_from(synth, seed)),
                          batch_size, shuffle=True, seed=seed,
                          drop_last=True) for c in cfgs]
    steps = [jax.jit(make_train_step(c, c.data.keypoint_schema),
                     donate_argnums=(0,)) for c in cfgs]

    state = create_train_state(cfgs[0], build_model(cfgs[0]),
                               jax.random.PRNGKey(seed))
    rng = jax.random.PRNGKey(seed + 1)

    history = []
    for epoch in range(epochs):
        i = epoch % len(scales)  # cycle scales per epoch
        cfg = cfgs[i]
        n = 0
        for batch in loaders[i].epoch(epoch):
            db = device_batch(batch, cfg.data.pixel_mean, cfg.data.pixel_std)
            rng, step_rng = jax.random.split(rng)
            state, metrics = steps[i](state, db, step_rng)
            n += 1
            if n >= steps_per_scale:
                break
        loss = float(metrics["total_loss"])
        history.append((scales[i], loss))
        if verbose:
            print(f"epoch {epoch}: scale {scales[i]} "
                  f"loss {loss:.4f}", flush=True)
    return state, history


def _cache_from(synth, seed):
    """Rebuild the in-memory image cache for the synthetic dataset."""
    import cv2

    rng = np.random.RandomState(seed)
    cache = {}
    for im in synth["images"]:
        # synthetic_coco_dataset with no image_dir keeps pixel arrays out
        # of the dict; regenerate deterministic noise images
        cache[im["file_name"]] = rng.randint(
            0, 255, (im["height"], im["width"], 3)).astype(np.uint8)
    return cache


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--steps-per-scale", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--backbone", default="litehrnet")
    a = p.parse_args()
    _, history = run(epochs=a.epochs, steps_per_scale=a.steps_per_scale,
                     batch_size=a.batch_size, backbone=a.backbone)
    print("trained one parameter tree across scales:",
          sorted({s for s, _ in history}))

"""Production streaming serving: loader -> H2D prefetch -> device compute.

Demonstrates the serving stack the reference does not have
(/root/reference/inference.py predicts one crop at a time on one GPU):

1. a threaded host loader decoding JPEGs ahead of the consumer
2. a transfer thread committing batches to the device(s) ahead of compute
3. bounded-in-flight async dispatch (`PoseInference.predict_stream`)
4. optional multi-chip data-parallel serving (`mesh=create_mesh(...)`)
5. optional int8 PTQ serving (`quantize=True`)

Run:  python examples/streaming_serving.py [--mesh] [--int8]
(CPU-safe: tiny model; on TPU swap in hrnet_w32/fusion + real data.)
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", action="store_true",
                    help="shard batches over all local devices")
    ap.add_argument("--int8", action="store_true",
                    help="serve the int8 PTQ path (hrnet backbones)")
    ap.add_argument("--images", type=int, default=32)
    args = ap.parse_args()

    from infantposeestimation_gaussianbias_tpu.config import Config
    from infantposeestimation_gaussianbias_tpu.data import (
        synthetic_coco_dataset,
    )
    from infantposeestimation_gaussianbias_tpu.data.pipeline import (
        build_dataloader,
    )
    from infantposeestimation_gaussianbias_tpu.inference import PoseInference
    from infantposeestimation_gaussianbias_tpu.schemas import COCO17

    cfg = Config()
    # tiny demo config — for production use hrnet_w32 + fusion at 256x192
    cfg.model.backbone = "hrnet_w32" if args.int8 else "litehrnet"
    cfg.model.head_type = "fusion"
    cfg.model.compute_dtype = "float32"
    cfg.data.input_size = (64, 64)
    cfg.data.heatmap_size = (16, 16)
    cfg.eval.batch_size = 8
    cfg.eval.flip_test = False

    with tempfile.TemporaryDirectory() as tmp:
        img_dir = os.path.join(tmp, "images")
        ann_dir = os.path.join(tmp, "annotations")
        os.makedirs(img_dir)
        os.makedirs(ann_dir)
        synth = synthetic_coco_dataset(
            num_images=args.images, num_keypoints=17, image_dir=img_dir,
            seed=0, height=128, width=160,
            keypoint_names=COCO17.keypoint_names, skeleton=COCO17.skeleton)
        with open(os.path.join(ann_dir, "val.json"), "w") as f:
            json.dump(synth, f)
        cfg.data.data_root = tmp
        cfg.data.val_ann = "annotations/val.json"
        cfg.data.val_img_prefix = "images/"

        mesh = None
        if args.mesh:
            from infantposeestimation_gaussianbias_tpu.parallel import (
                create_mesh,
            )

            mesh = create_mesh(data_axis=0, model_axis=1)
            print(f"serving over mesh {dict(mesh.shape)}")

        loader = build_dataloader(cfg, is_train=False)
        infer = PoseInference(cfg, quantize=args.int8, mesh=mesh)

        t0 = time.perf_counter()
        n = 0
        for coords, scores in infer.predict_stream(loader.epoch(0),
                                                   max_in_flight=2):
            n += coords.shape[0]
            print(f"  batch of {coords.shape[0]}: "
                  f"mean score {float(scores.mean()):.3f}")
        dt = time.perf_counter() - t0
        print(f"streamed {n} crops in {dt:.2f}s "
              f"({n / dt:,.0f} crops/s incl. host decode; "
              f"precision={'int8' if args.int8 else 'float'})")


if __name__ == "__main__":
    main()

"""Inference CLI: image / directory / video (rebuild of
/root/reference/inference.py:287-381).

    python -m infantposeestimation_gaussianbias_tpu.cli.infer \
        --variant hrnet_w32 --checkpoint checkpoints/best \
        --input img.jpg --output out.jpg
    ... --input video.mp4 --video --clinical-report report.png
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..inference import PoseInference
from .common import add_config_args, resolve_config


def main(argv=None):
    parser = argparse.ArgumentParser(description="Pose inference")
    add_config_args(parser)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--input", required=True,
                        help="image file, directory, or video")
    parser.add_argument("--output", default=None)
    parser.add_argument("--bbox", type=float, nargs=4, default=None,
                        metavar=("X1", "Y1", "X2", "Y2"))
    parser.add_argument("--video", action="store_true")
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--clinical-report", default=None,
                        help="write a clinical analysis figure (video mode)")
    parser.add_argument("--no-fold", action="store_true",
                        help="disable the (exact) BN-fold float serving "
                             "transform")
    parser.add_argument("--int8", action="store_true",
                        help="serve in int8 (PTQ, calibrated on the first "
                             "batch; hrnet conv-PTQ or hrformer Dense-PTQ)")
    parser.add_argument("--mesh", type=int, nargs="?", const=0, default=None,
                        metavar="MODEL_AXIS",
                        help="serve over all local devices on a "
                             "('data','model') mesh; optional value = model-"
                             "axis size (default 1: pure data parallel)")
    args = parser.parse_args(argv)
    cfg = resolve_config(args)

    import cv2

    mesh = None
    tensor_parallel = False
    if args.mesh is not None:
        from ..parallel import create_mesh

        model_axis = max(1, args.mesh)
        mesh = create_mesh(data_axis=0, model_axis=model_axis)
        tensor_parallel = model_axis > 1
    infer = PoseInference(cfg, checkpoint=args.checkpoint,
                          quantize=args.int8,
                          fold=False if args.no_fold else None,
                          mesh=mesh, tensor_parallel=tensor_parallel)
    schema = cfg.data.keypoint_schema

    if args.video or args.input.lower().endswith((".mp4", ".avi", ".mov")):
        traj, scores, fps = infer.predict_video(args.input,
                                                max_frames=args.max_frames)
        print(f"processed {len(traj)} frames @ {fps:.1f} fps")
        if args.output:
            from ..viz.clinical import create_video_with_pose

            create_video_with_pose(args.input, traj, scores, args.output,
                                   schema, fps=fps,
                                   max_frames=args.max_frames)
            print(f"wrote {args.output}")
        if args.clinical_report:
            from ..viz.clinical import create_clinical_report_figure

            create_clinical_report_figure(
                traj, scores, schema, args.clinical_report,
                fps=fps, cfg_clinical=cfg.clinical)
            print(f"wrote {args.clinical_report}")
        return

    if os.path.isdir(args.input):
        results = infer.predict_directory(args.input)
        for name, r in results.items():
            mean_s = float(np.mean(r["scores"]))
            print(f"{name}: mean score {mean_s:.3f}")
        return

    img = cv2.imread(args.input)
    if img is None:
        raise SystemExit(f"cannot read {args.input}")
    rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    kpts, scores = infer.predict(rgb, args.bbox)
    for name, (x, y), s in zip(schema.keypoint_names, kpts, scores):
        print(f"{name:>16}: ({x:7.1f}, {y:7.1f})  score {s:.3f}")
    if args.output:
        from ..viz.skeleton import draw_skeleton

        out = draw_skeleton(img, kpts, scores, schema)
        cv2.imwrite(args.output, out)
        print(f"wrote {args.output}")


if __name__ == "__main__":
    main()

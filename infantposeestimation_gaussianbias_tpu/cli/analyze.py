"""Model analysis CLI: parameter/activation/benchmark report + figures.

Rebuild of the reference's analysis driver
(/root/reference/analysis/analysis_example.py): loads a model (optionally a
checkpoint), prints a parameter summary and activation statistics, runs the
inference-latency harness, and writes saliency / Grad-CAM / occlusion
figures.

    python -m infantposeestimation_gaussianbias_tpu.cli.analyze \
        --variant hrnet_w32 --out-dir analysis_out [--checkpoint ckpt/best]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from ..analysis import (
    activation_statistics,
    benchmark_model,
    capture_activations,
    grad_cam,
    occlusion_sensitivity,
    parameter_summary,
    saliency_map,
)
from ..models import build_model
from ..train.checkpoint import CheckpointManager
from ..train.step import create_train_state
from .common import add_config_args, resolve_config


def main(argv=None):
    parser = argparse.ArgumentParser(description="Analyze a pose model")
    add_config_args(parser)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--out-dir", default="analysis_out")
    parser.add_argument("--benchmark", action="store_true",
                        help="run the latency harness (slow first compile)")
    parser.add_argument("--keypoint", type=int, default=0,
                        help="keypoint index for sensitivity figures")
    args = parser.parse_args(argv)
    cfg = resolve_config(args)
    os.makedirs(args.out_dir, exist_ok=True)

    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(cfg.train.seed))
    if args.checkpoint:
        mgr = CheckpointManager(os.path.dirname(args.checkpoint) or ".")
        state, _ = mgr.restore(state, os.path.basename(args.checkpoint))
    variables = state.variables

    print(parameter_summary(state.params))
    with open(os.path.join(args.out_dir, "parameters.txt"), "w") as f:
        f.write(parameter_summary(state.params, top=100))

    W, H = cfg.data.input_size
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))

    acts = capture_activations(model, variables, x)
    stats = activation_statistics(acts)
    dead = {k: v["dead_channel_fraction"] for k, v in stats.items()
            if v.get("dead_channel_fraction", 0) > 0.2}
    with open(os.path.join(args.out_dir, "activations.json"), "w") as f:
        json.dump({k: {kk: vv for kk, vv in v.items() if kk != "shape"}
                   for k, v in stats.items()}, f, indent=1)
    print(f"captured {len(acts)} activations; "
          f"{len(dead)} layers with >20% dead channels")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = np.asarray(x[0])
    sal = saliency_map(model, variables, img, args.keypoint)
    cam = grad_cam(model, variables, img, args.keypoint)
    occ = occlusion_sensitivity(model, variables, img, args.keypoint,
                                patch=max(H // 8, 8), stride=max(H // 8, 8))
    for name, m in (("saliency", sal), ("gradcam", cam), ("occlusion", occ)):
        fig, ax = plt.subplots()
        im = ax.imshow(m, cmap="inferno")
        fig.colorbar(im, ax=ax)
        ax.set_title(f"{name} (keypoint {args.keypoint})")
        fig.savefig(os.path.join(args.out_dir, f"{name}.png"), dpi=120)
        plt.close(fig)
    print(f"figures written to {args.out_dir}")

    if args.benchmark:
        stats = benchmark_model(cfg, batch_size=64)
        print(json.dumps(stats))
        with open(os.path.join(args.out_dir, "latency.json"), "w") as f:
            json.dump(stats, f, indent=1)


if __name__ == "__main__":
    main()

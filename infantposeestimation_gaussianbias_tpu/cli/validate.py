"""Validation CLI (rebuild of /root/reference/validate.py:143-203).

    python -m infantposeestimation_gaussianbias_tpu.cli.validate \
        --variant hrnet_w32 --checkpoint checkpoints/best
"""

from __future__ import annotations

import argparse
import json
import os

import jax

from ..data.pipeline import build_dataloader
from ..models import build_model, serving_mode_supported
from ..train.checkpoint import CheckpointManager
from ..train.loop import setup_logging, validate
from ..train.step import create_train_state
from .common import add_config_args, resolve_config


def main(argv=None):
    parser = argparse.ArgumentParser(description="Evaluate on COCO val")
    add_config_args(parser)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--int8", action="store_true",
                        help="serve int8 PTQ (calibrated on the first "
                             "val batch); loss reporting is skipped")
    parser.add_argument("--no-fold", action="store_true",
                        help="disable the (exact) BN-fold serving "
                             "transform for the float path")
    parser.add_argument("--mesh", action="store_true",
                        help="shard eval batches over all local devices "
                             "(data-parallel evaluation)")
    args = parser.parse_args(argv)
    cfg = resolve_config(args)
    setup_logging()

    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(cfg.train.seed))
    if args.checkpoint:
        mgr = CheckpointManager(os.path.dirname(args.checkpoint) or ".")
        state, _ = mgr.restore(state, os.path.basename(args.checkpoint))

    loader = build_dataloader(cfg, is_train=False)
    with open(os.path.join(cfg.data.data_root, cfg.data.val_ann)) as f:
        gt = json.load(f)

    serve_apply = serve_vars = None
    with_loss = True
    if args.int8:
        from ..data.pipeline import device_batch
        from ..models import quantize_model

        first = next(iter(loader.epoch(0)))
        crops = device_batch(first, cfg.data.pixel_mean,
                             cfg.data.pixel_std)["image"]
        serve_vars = quantize_model(cfg, state.variables, [crops])
        serve_apply = build_model(cfg, quant=True).apply
        with_loss = False
    elif not args.no_fold and serving_mode_supported(
            cfg.model.backbone, cfg.model.head_type, cfg.model.norm,
            fold=True):
        from ..models import fold_variables

        serve_vars = fold_variables(state.variables)
        serve_apply = build_model(cfg, fold=True).apply

    mesh = None
    if args.mesh:
        from ..parallel import create_mesh

        n_dev = len(jax.devices())
        if cfg.eval.batch_size % n_dev:
            raise SystemExit(
                f"--mesh needs eval.batch_size ({cfg.eval.batch_size}) "
                f"divisible by the device count ({n_dev})")
        mesh = create_mesh(data_axis=0, model_axis=1)
    results = validate(cfg, state, loader, gt, with_loss=with_loss,
                       apply_fn=serve_apply, variables=serve_vars,
                       mesh=mesh)
    for k, v in results.items():
        print(f"{k:>6}: {v:.4f}")


if __name__ == "__main__":
    main()

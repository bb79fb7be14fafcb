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
from ..models import build_model
from ..train.checkpoint import CheckpointManager
from ..train.loop import setup_logging, validate
from ..train.step import create_train_state
from .common import add_config_args, resolve_config


def main(argv=None):
    parser = argparse.ArgumentParser(description="Evaluate on COCO val")
    add_config_args(parser)
    parser.add_argument("--checkpoint", default=None)
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
    results = validate(cfg, state, loader, gt)
    for k, v in results.items():
        print(f"{k:>6}: {v:.4f}")


if __name__ == "__main__":
    main()

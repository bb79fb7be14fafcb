"""Training CLI (rebuild of /root/reference/train.py:371-485).

    python -m infantposeestimation_gaussianbias_tpu.cli.train \
        --variant hrnet_w32 --set data.data_root=/data/coco train.lr=5e-4
"""

from __future__ import annotations

import argparse
import os

from ..data.pipeline import build_dataloader
from ..train.loop import setup_logging, train
from .common import add_config_args, resolve_config


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train a pose estimator")
    add_config_args(parser)
    parser.add_argument("--epochs", type=int, default=None,
                        help="override max epochs")
    parser.add_argument("--no-val", action="store_true")
    args = parser.parse_args(argv)
    cfg = resolve_config(args)

    os.makedirs(cfg.log_dir, exist_ok=True)
    setup_logging(os.path.join(cfg.log_dir, f"{cfg.exp_name}.log"))

    train_loader = build_dataloader(cfg, is_train=True)
    val_loader, gt = None, None
    if not args.no_val:
        val_loader = build_dataloader(cfg, is_train=False)
        import json

        with open(os.path.join(cfg.data.data_root, cfg.data.val_ann)) as f:
            gt = json.load(f)
    train(cfg, train_loader, val_loader, gt, max_epochs=args.epochs)


if __name__ == "__main__":
    main()

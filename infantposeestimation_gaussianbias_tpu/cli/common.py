"""Shared CLI plumbing: config resolution from variant + YAML + overrides."""

from __future__ import annotations

import argparse

from ..config import Config, apply_overrides, get_variant, load_yaml


def add_config_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--variant", default="default",
                        help="named config variant (default, hrnet_w32, "
                             "hrnet_w48, hrformer_base, hrformer_small, "
                             "lightweight, preemie)")
    parser.add_argument("--config", default=None,
                        help="YAML config file merged over the variant")
    parser.add_argument("--set", dest="overrides", nargs="*", default=[],
                        metavar="KEY=VALUE",
                        help="dotted-path overrides, e.g. train.lr=1e-3")


def resolve_config(args: argparse.Namespace) -> Config:
    cfg = get_variant(args.variant)
    if args.config:
        cfg = load_yaml(args.config, base=cfg)
    apply_overrides(cfg, args.overrides)
    return cfg

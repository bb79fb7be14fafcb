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


def setup_runtime(cfg: Config) -> None:
    """Process-level JAX runtime knobs shared by every CLI.

    Currently: the persistent compilation cache (``cfg.compile_cache``),
    so serving/training restarts reuse compiled XLA programs instead of
    paying the 20-40s TPU compile each launch.  Safe to call before or
    after backend initialization; a read-only cache directory degrades
    to no caching rather than failing the CLI."""
    if not cfg.compile_cache:
        return
    import os

    import jax

    path = os.path.abspath(os.path.expanduser(cfg.compile_cache))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


def resolve_config(args: argparse.Namespace) -> Config:
    cfg = get_variant(args.variant)
    if args.config:
        cfg = load_yaml(args.config, base=cfg)
    apply_overrides(cfg, args.overrides)
    setup_runtime(cfg)
    return cfg

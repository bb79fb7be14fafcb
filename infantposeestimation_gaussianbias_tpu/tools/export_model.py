"""Export the fused inference pipeline as a serialized StableHLO artifact.

Production-serving path with no reference equivalent (the reference serves
by loading torch checkpoints into Python): the COMPLETE crop -> forward ->
decode -> back-projection pipeline, with weights baked in, serializes to a
single portable artifact via jax.export.  A server deserializes and calls
it with zero framework code — and the artifact pins the exact numerics.

    python -m infantposeestimation_gaussianbias_tpu.tools.export_model \
        --variant hrnet_w32 --checkpoint ckpt/best --batch 64 \
        --output model.stablehlo
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def build_serving_fn(cfg, state, frame_hw: Tuple[int, int] = (512, 512),
                     fold: Optional[bool] = None, quantize: bool = False,
                     calib_crops=None):
    """(frames u8 (B,H,W,3), centers (B,2), scales (B,2)) ->
    (keypoints (B,K,2) frame coords, scores (B,K)).

    ``fold`` bakes inference BN into the conv weights before export
    (models/fold.py — exact); default: fold whenever the architecture
    supports it.  ``quantize`` exports the int8 PTQ serving path instead
    (ops/quant.py), calibrated on ``calib_crops`` (normalized
    (N, H, W, 3)) — the exported artifact carries the int8 weights and
    frozen activation scales."""
    from ..models import build_model, decode_outputs, flip_inference
    from ..ops import affine, decode

    W, H = cfg.data.input_size
    hm_w, hm_h = cfg.data.heatmap_size
    flip_idx = jnp.asarray(cfg.data.keypoint_schema.flip_index())
    variables = state.variables
    apply_fn = state.apply_fn

    if quantize:
        from ..models import quantize_model

        if calib_crops is None:
            raise ValueError("int8 export needs calib_crops")
        variables = quantize_model(cfg, variables,
                                   [jnp.asarray(calib_crops)])
        apply_fn = build_model(cfg, quant=True).apply
        fold = False  # BN already folded into the int8 epilogues
    if fold is None:
        from ..models.pose_estimator import serving_mode_supported

        fold = serving_mode_supported(cfg.model.backbone,
                                      cfg.model.head_type,
                                      cfg.model.norm, fold=True)
    if fold:
        from ..models import fold_variables

        variables = fold_variables(variables)
        apply_fn = build_model(cfg, fold=True).apply

    def serve(frames, centers, scales):
        crops = affine.crop_and_normalize(
            frames.astype(jnp.float32), centers, scales, (W, H),
            mean=cfg.data.pixel_mean, std=cfg.data.pixel_std)
        coords, scores = flip_inference(
            apply_fn, variables, crops, flip_idx,
            cfg.model.head_type, cfg.eval.decode,
            shift_heatmap=cfg.eval.shift_heatmap, flip=cfg.eval.flip_test)
        coords = coords * jnp.asarray([W / hm_w, H / hm_h], jnp.float32)
        coords = decode.transform_preds(coords, centers, scales, (W, H))
        return coords, scores

    return serve


def export_pipeline(cfg, state, batch: int, frame_hw=(512, 512),
                    quantize: bool = False, calib_crops=None) -> bytes:
    from jax import export as jexport

    serve = build_serving_fn(cfg, state, frame_hw, quantize=quantize,
                             calib_crops=calib_crops)
    fh, fw = frame_hw
    args = (
        jax.ShapeDtypeStruct((batch, fh, fw, 3), jnp.uint8),
        jax.ShapeDtypeStruct((batch, 2), jnp.float32),
        jax.ShapeDtypeStruct((batch, 2), jnp.float32),
    )
    exported = jexport.export(jax.jit(serve))(*args)
    return exported.serialize()


def load_pipeline(blob: bytes):
    """Deserialize; returns an object with .call(frames, centers, scales)."""
    from jax import export as jexport

    return jexport.deserialize(blob)


def main(argv=None):
    import argparse

    from ..cli.common import add_config_args, resolve_config
    from ..models import build_model
    from ..train.checkpoint import CheckpointManager
    from ..train.step import create_train_state

    p = argparse.ArgumentParser(description="Export serving pipeline")
    add_config_args(p)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--frame-size", type=int, nargs=2, default=(512, 512),
                   metavar=("H", "W"))
    p.add_argument("--output", required=True)
    p.add_argument("--int8", action="store_true",
                   help="export the int8 PTQ serving path; calibrates "
                        "on the first val batch when data.data_root is "
                        "configured, else on random crops (warned)")
    args = p.parse_args(argv)
    cfg = resolve_config(args)

    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(cfg.train.seed))
    if args.checkpoint:
        mgr = CheckpointManager(os.path.dirname(args.checkpoint) or ".")
        state, _ = mgr.restore(state, os.path.basename(args.checkpoint))

    calib = None
    if args.int8:
        W, H = cfg.data.input_size
        try:
            from ..data.pipeline import build_dataloader, device_batch

            loader = build_dataloader(cfg, is_train=False)
            first = next(iter(loader.epoch(0)))
            calib = device_batch(first, cfg.data.pixel_mean,
                                 cfg.data.pixel_std)["image"]
        except Exception as e:
            import warnings

            warnings.warn(
                f"no val data for int8 calibration ({e}); calibrating on "
                "RANDOM crops — activation scales will not match real "
                "images. Configure data.data_root for a faithful export.")
            rng = np.random.RandomState(0)
            calib = jnp.asarray(
                rng.randn(64, H, W, 3).astype(np.float32))

    blob = export_pipeline(cfg, state, args.batch, tuple(args.frame_size),
                           quantize=args.int8, calib_crops=calib)
    with open(args.output, "wb") as f:
        f.write(blob)
    print(f"exported {len(blob) / 1e6:.1f} MB -> {args.output}")


if __name__ == "__main__":
    main()

"""One-command parity validation of a reference PyTorch checkpoint.

The moment real COCO(-style) data is available, this produces the AP
comparison table against the reference's published numbers
(/root/reference/README.md:224-229) without retraining:

    python -m infantposeestimation_gaussianbias_tpu.tools.\
validate_reference_checkpoint \
        --checkpoint pose_hrnet_w32_256x192.pth \
        --data-root /data/coco --val-ann annotations/person_keypoints_val2017.json \
        --img-dir val2017

It imports the torch state_dict through tools/import_torch_checkpoint.py
(numerical forward parity is pinned by tests/test_torch_import.py), runs
the full flip-test validation driver (train/loop.py::validate — the same
protocol as /root/reference/validate.py:143-203), and prints our AP next
to the reference's claimed AP for the matching row.

--dry-run exercises the entire path on synthetic fixtures (random-weight
torch-layout checkpoint + tiny generated COCO val set) so the command is
known-good before data exists.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile

# Reference claims (/root/reference/README.md:224-229).
REFERENCE_CLAIMS = {
    ("hrnet_w32", (192, 256)): {"AP": 0.744, "AP50": 0.905, "AP75": 0.819},
    ("hrnet_w48", (288, 384)): {"AP": 0.763, "AP50": 0.908, "AP75": 0.829},
    ("hrformer_base", (192, 256)): {"AP": 0.756, "AP50": 0.908, "AP75": 0.828},
    ("hrformer_base", (288, 384)): {"AP": 0.772, "AP50": 0.910, "AP75": 0.836},
}


def build_state(cfg):
    import jax

    from ..models import build_model
    from ..train.step import create_train_state

    model = build_model(cfg)
    return create_train_state(cfg, model, jax.random.PRNGKey(0))


def run_validation(cfg, state, int8: bool = False, calib_batches: int = 4):
    """Float flip-test validation; with ``int8`` also PTQ-calibrate on the
    first ``calib_batches`` val-image batches (REAL activation
    distributions, not synthetic noise — the round-2 verdict's re-guard
    hook) and run the int8 serving path, returning both result dicts."""
    from ..data.pipeline import build_dataloader, device_batch
    from ..train.loop import validate

    loader = build_dataloader(cfg, is_train=False)
    with open(os.path.join(cfg.data.data_root, cfg.data.val_ann)) as f:
        gt = json.load(f)
    results = validate(cfg, state, loader, gt)
    if not int8:
        return results

    from ..models import build_model, quantize_model

    calib = []
    for i, batch in enumerate(loader.epoch(0)):
        if i >= calib_batches:
            break
        calib.append(device_batch(batch, cfg.data.pixel_mean,
                                  cfg.data.pixel_std)["image"])
    serve_vars = quantize_model(cfg, state.variables, calib)
    serve_apply = build_model(cfg, quant=True).apply
    results_int8 = validate(cfg, state, loader, gt, with_loss=False,
                            apply_fn=serve_apply, variables=serve_vars)
    return results, results_int8


def int8_delta_table(results, results_int8):
    lines = [f"{'metric':>6} | {'float':>8} | {'int8':>8} | {'delta':>8}"]
    lines.append("-" * 40)
    for k in ("AP", "AP50", "AP75", "AP_M", "AP_L", "AR"):
        if k in results and k in results_int8:
            lines.append(f"{k:>6} | {results[k]:8.4f} | "
                         f"{results_int8[k]:8.4f} | "
                         f"{results_int8[k] - results[k]:+8.4f}")
    return "\n".join(lines)


def comparison_table(results, backbone, input_size):
    claims = REFERENCE_CLAIMS.get((backbone, tuple(input_size)))
    lines = [f"{'metric':>6} | {'ours':>8} | {'reference':>9} | {'delta':>8}"]
    lines.append("-" * 42)
    for k in ("AP", "AP50", "AP75", "AP_M", "AP_L", "AR"):
        if k not in results:
            continue
        ours = results[k]
        if claims and k in claims:
            ref = claims[k]
            lines.append(f"{k:>6} | {ours:8.4f} | {ref:9.4f} | "
                         f"{ours - ref:+8.4f}")
        else:
            lines.append(f"{k:>6} | {ours:8.4f} | {'—':>9} | {'—':>8}")
    return "\n".join(lines)


def _make_dry_run_fixtures(tmp, cfg):
    """Random-weight reference-layout checkpoint + a tiny COCO val set.

    Uses the reference-structured torch oracle models from the test suite
    (tests/torch_hrnet_oracle.py — same state_dict naming as
    /root/reference/models/hrnet.py + fusion_head.py), so the dry run
    exercises the exact import path a real reference .pth will take.
    """
    import torch

    try:
        from tests.torch_hrnet_oracle import TorchFusionHead, TorchHRNet
    except ImportError as e:  # pragma: no cover
        raise SystemExit(
            "--dry-run needs the repo test suite on sys.path "
            "(run from the repository root)") from e

    if cfg.model.backbone.startswith("hrformer"):
        from tests.torch_hrformer_oracle import TorchHRFormer

        spec = {"hrformer_base": ((78, 156, 312, 624), (2, 4, 8, 16),
                                  (1, 4, 2)),
                "hrformer_small": ((32, 64, 128, 256), (1, 2, 4, 8),
                                   (1, 4, 2))}[cfg.model.backbone]
        tm = TorchHRFormer(channels=spec[0], heads=spec[1],
                           stage_modules=spec[2]).eval()
        base = spec[0][0]
    else:
        base = {"hrnet_w32": 32, "hrnet_w48": 48}[cfg.model.backbone]
        tm = TorchHRNet(base=base).eval()
    sd = {f"backbone.{k}": v for k, v in tm.state_dict().items()}
    if cfg.model.head_type == "fusion":
        th = TorchFusionHead(in_ch=base, K=cfg.data.num_keypoints,
                             hidden=cfg.model.hidden_dim).eval()
        sd.update({f"head.{k}": v for k, v in th.state_dict().items()})
    ckpt = os.path.join(tmp, "reference.pth")
    torch.save({"model_state_dict": sd, "epoch": 0}, ckpt)

    from ..data import synthetic_coco_dataset
    from ..schemas import COCO17

    data_root = os.path.join(tmp, "coco")
    img_dir = os.path.join(data_root, "images")
    ann_dir = os.path.join(data_root, "annotations")
    os.makedirs(img_dir)
    os.makedirs(ann_dir)
    W, H = cfg.data.input_size
    synth = synthetic_coco_dataset(
        num_images=4, num_keypoints=cfg.data.num_keypoints,
        image_dir=img_dir, seed=3, height=H, width=W,
        keypoint_names=COCO17.keypoint_names, skeleton=COCO17.skeleton)
    with open(os.path.join(ann_dir, "val.json"), "w") as f:
        json.dump(synth, f)
    return ckpt, data_root


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Validate a reference .pth and compare AP to its claims")
    parser.add_argument("--checkpoint", help="reference .pth path")
    parser.add_argument("--data-root", help="COCO-style dataset root")
    parser.add_argument("--val-ann",
                        default="annotations/person_keypoints_val2017.json")
    parser.add_argument("--img-dir", default="val2017")
    parser.add_argument("--backbone", default="hrnet_w32",
                        choices=["hrnet_w32", "hrnet_w48",
                                 "hrformer_base", "hrformer_small"])
    parser.add_argument("--head", default="fusion",
                        choices=["fusion", "heatmap"])
    parser.add_argument("--input-size", type=int, nargs=2,
                        default=[192, 256], metavar=("W", "H"))
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--dry-run", action="store_true",
                        help="run the full path on synthetic fixtures")
    parser.add_argument("--int8", action="store_true",
                        help="also PTQ-calibrate on the provided val "
                             "images and report the float-vs-int8 AP "
                             "delta (the int8 re-guard for real data)")
    args = parser.parse_args(argv)

    from ..config import Config
    from .import_torch_checkpoint import load_into_state

    cfg = Config()
    cfg.model.backbone = args.backbone
    cfg.model.head_type = args.head
    cfg.model.compute_dtype = "bfloat16"
    cfg.data.input_size = tuple(args.input_size)
    cfg.data.heatmap_size = (args.input_size[0] // 4, args.input_size[1] // 4)
    cfg.eval.flip_test = True
    cfg.eval.batch_size = args.batch_size

    if args.dry_run:
        with tempfile.TemporaryDirectory() as tmp:
            ckpt, data_root = _make_dry_run_fixtures(tmp, cfg)
            cfg.data.data_root = data_root
            cfg.data.val_ann = "annotations/val.json"
            cfg.data.val_img_prefix = "images/"
            cfg.eval.batch_size = 2
            state = build_state(cfg)
            state = load_into_state(state, ckpt, head_type=args.head)
            out = run_validation(cfg, state, int8=args.int8,
                                 calib_batches=2)
            results = out[0] if args.int8 else out
            print(comparison_table(results, args.backbone,
                                   cfg.data.input_size))
            if args.int8:
                print(int8_delta_table(results, out[1]))
            print("dry-run OK: import -> flip-test validate -> COCOeval "
                  + ("-> int8 PTQ re-validate " if args.int8 else "")
                  + "all ran end to end")
            return out

    if not args.checkpoint or not args.data_root:
        parser.error("--checkpoint and --data-root are required "
                     "(or use --dry-run)")
    cfg.data.data_root = args.data_root
    cfg.data.val_ann = args.val_ann
    cfg.data.val_img_prefix = args.img_dir.rstrip("/") + "/"
    state = build_state(cfg)
    state = load_into_state(state, args.checkpoint, head_type=args.head)
    out = run_validation(cfg, state, int8=args.int8)
    results = out[0] if args.int8 else out
    print(comparison_table(results, args.backbone, cfg.data.input_size))
    if args.int8:
        print(int8_delta_table(results, out[1]))
    return out


if __name__ == "__main__":
    main()

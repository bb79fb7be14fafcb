"""PoseEstimator assembly: backbone + head, with factory from config.

Rebuild of /root/reference/models/pose_estimator.py:146-392 as a flax
module.  Loss computation and decode are pure functions (see losses/ and
ops/decode.py) composed around `apply` — the flax idiom — rather than
methods on the module; `flip_inference` below reproduces the reference's
flip-test contract including its quirk of sampling offsets from the
UNFLIPPED pass against flip-averaged heatmaps
(/root/reference/models/pose_estimator.py:303-325).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import decode as decode_ops
from .heads import FusedHead, FusionHead, HeatmapHead, SimCCHead
from .hrformer import hrformer_base, hrformer_small
from .hrnet import hrnet_w32, hrnet_w48
from .litehrnet import litehrnet

BACKBONES: Dict[str, Callable[..., nn.Module]] = {
    "hrnet_w32": hrnet_w32,
    "hrnet_w48": hrnet_w48,
    "hrformer_base": hrformer_base,
    "hrformer_small": hrformer_small,
    "litehrnet": litehrnet,
}


def validate_serving_mode(backbone_name: str, head_type: str, norm: str,
                          quant: bool = False, fold: bool = False) -> None:
    """Raise ValueError unless the architecture supports the requested
    int8-PTQ / BN-fold serving mode.

    The single source of truth for serving supportability — used by both
    PoseEstimator.setup (where flax's lazy setup() would otherwise defer
    the error to first apply) and PoseInference (which needs the answer
    eagerly at construction), so the two checks cannot drift.
    """
    if quant:
        quant_conv = backbone_name.startswith("hrnet")
        quant_dense = backbone_name.startswith("hrformer")
        if not (quant_conv or quant_dense):
            raise ValueError(
                f"int8 PTQ supports the hrnet/hrformer backbones, not "
                f"{backbone_name!r}")
        if quant_conv and head_type not in ("fusion", "heatmap"):
            raise ValueError(
                f"int8 PTQ supports fusion/heatmap heads, not "
                f"{head_type!r}")
    if fold:
        if not backbone_name.startswith(("hrnet", "hrformer")):
            raise ValueError(
                f"BN-fold serving supports hrnet/hrformer backbones, "
                f"not {backbone_name!r}")
        if head_type not in ("fusion", "heatmap"):
            raise ValueError(
                f"BN-fold serving supports fusion/heatmap heads, not "
                f"{head_type!r}")
        if norm != "batchnorm":
            raise ValueError("BN-fold requires batchnorm ConvNorms")


def serving_mode_supported(backbone_name: str, head_type: str, norm: str,
                           quant: bool = False, fold: bool = False) -> bool:
    """Boolean form of validate_serving_mode."""
    try:
        validate_serving_mode(backbone_name, head_type, norm,
                              quant=quant, fold=fold)
        return True
    except ValueError:
        return False


class PoseEstimator(nn.Module):
    """Backbone + head. Input NHWC images; outputs dict of NHWC maps."""

    backbone_name: str = "hrnet_w32"
    head_type: str = "heatmap"  # heatmap | fusion | fused | simcc
    num_keypoints: int = 17
    hidden_dim: int = 256
    input_size: Tuple[int, int] = (192, 256)  # (W, H), for simcc bins
    simcc_split_ratio: float = 2.0
    norm: str = "batchnorm"
    dtype: Any = jnp.float32
    use_pallas: bool = False
    # int8 PTQ serving mode / calibration mode (ops/quant.py).  Supported
    # for the HRNet backbones with the fusion/heatmap heads.
    quant: bool = False
    calibrate: bool = False
    # BN-fold float serving (models/fold.py): ConvNorm BatchNorms baked
    # into conv weights+bias.  hrnet/hrformer + fusion/heatmap heads.
    fold: bool = False
    # Rematerialize backbone exchange modules in the backward pass
    # (hrnet backbones).
    remat: bool = False
    # HRNet modules per exchange stage; None = reference (1, 4, 3).
    stage_modules: Optional[Tuple[int, int, int]] = None
    # HRFormer attention window (7 = reference/checkpoint parity;
    # 8 = TPU-native tiling, see config.ModelConfig.hrformer_window_size).
    hrformer_window_size: int = 7
    # Device mesh for mesh-composed Pallas kernels (hrformer backbones):
    # with a multi-device mesh the W-MSA kernel runs per-shard via
    # shard_map instead of replicating its operands under GSPMD.
    mesh: Any = None

    def setup(self):
        kwargs = dict(norm=self.norm, dtype=self.dtype)
        if self.backbone_name.startswith("hrformer"):
            kwargs["use_pallas"] = self.use_pallas
            kwargs["mesh"] = self.mesh
            if self.hrformer_window_size != 7:
                kwargs["window_size"] = self.hrformer_window_size
        if self.remat and self.backbone_name.startswith(("hrnet",
                                                         "hrformer")):
            kwargs["remat"] = True
        if self.stage_modules and self.backbone_name.startswith("hrnet"):
            kwargs["stage_modules"] = tuple(self.stage_modules)
        # int8 PTQ: hrnet quantizes the whole conv pipeline (QTensor
        # activations, BN folded into epilogues) including the head;
        # hrformer quantizes its transformer Dense layers (the FLOPs)
        # while convs/norms/head stay in the compute dtype.
        validate_serving_mode(self.backbone_name, self.head_type, self.norm,
                              quant=self.quant or self.calibrate,
                              fold=self.fold)
        quant_conv = ((self.quant or self.calibrate)
                      and self.backbone_name.startswith("hrnet"))
        quant_dense = ((self.quant or self.calibrate)
                       and self.backbone_name.startswith("hrformer"))
        if quant_conv or quant_dense:
            kwargs.update(quant=self.quant, calibrate=self.calibrate)
        if self.fold:
            kwargs.update(fold=True)
        if self.backbone_name not in BACKBONES:
            raise ValueError(f"Unknown backbone {self.backbone_name!r}; "
                             f"known: {sorted(BACKBONES)}")
        self.backbone = BACKBONES[self.backbone_name](**kwargs)

        head_q = (dict(quant=self.quant, calibrate=self.calibrate)
                  if quant_conv else {})
        if self.fold:
            head_q = dict(head_q, fold=True)
        if self.head_type == "fusion":
            self.head = FusionHead(self.num_keypoints, self.hidden_dim,
                                   norm=self.norm, dtype=self.dtype,
                                   **head_q)
        elif self.head_type == "heatmap":
            self.head = HeatmapHead(self.num_keypoints, norm=self.norm,
                                    dtype=self.dtype, **head_q)
        elif self.head_type == "fused":
            self.head = FusedHead(self.num_keypoints, norm=self.norm,
                                  dtype=self.dtype)
        elif self.head_type == "simcc":
            self.head = SimCCHead(self.num_keypoints, self.input_size,
                                  self.simcc_split_ratio, dtype=self.dtype)
        else:
            raise ValueError(f"Unknown head type {self.head_type!r}")

    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        # named_scope -> XProf trace sections (SURVEY.md section 5.1)
        with jax.named_scope("backbone"):
            feats = self.backbone(x.astype(self.dtype), train)
        with jax.named_scope("head"):
            return self.head(feats, train)


def build_model(cfg, quant: bool = False, calibrate: bool = False,
                fold: bool = False, mesh: Any = None) -> PoseEstimator:
    """Build from a Config (ref models/pose_estimator.py:376-392).

    ``quant``/``calibrate`` build the int8 PTQ serving / calibration
    variants of the same architecture (see ops/quant.py); ``fold`` builds
    the BN-folded float serving variant (models/fold.py); ``mesh``
    composes the Pallas W-MSA kernel with a multi-device mesh via
    shard_map (hrformer backbones)."""
    dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    return PoseEstimator(
        backbone_name=cfg.model.backbone,
        head_type=cfg.model.head_type,
        num_keypoints=cfg.data.num_keypoints,
        hidden_dim=cfg.model.hidden_dim,
        input_size=tuple(cfg.data.input_size),
        simcc_split_ratio=cfg.model.simcc_split_ratio,
        norm=cfg.model.norm,
        dtype=dtype,
        # Pallas kernels only exist for the TPU backend; CPU runs (tests,
        # virtual-device meshes) silently take the XLA path.
        use_pallas=(getattr(cfg.model, "use_pallas", False)
                    and jax.default_backend() == "tpu"),
        quant=quant,
        calibrate=calibrate,
        fold=fold,
        remat=getattr(cfg.model, "remat", False),
        stage_modules=(tuple(cfg.model.hrnet_stage_modules)
                       if getattr(cfg.model, "hrnet_stage_modules", ())
                       else None),
        hrformer_window_size=getattr(cfg.model, "hrformer_window_size", 7),
        mesh=mesh,
    )


def decode_outputs(
    outputs: Dict[str, jnp.ndarray],
    head_type: str,
    decode_method: str = "quarter",
    softargmax_beta: float = 1.0,
    refine_radius: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode head outputs to (coords (B,K,2) heatmap-space, scores (B,K))."""
    if head_type == "simcc":
        return SimCCHead.decode(outputs["simcc_x"], outputs["simcc_y"])
    if head_type == "fusion":
        return decode_ops.fusion_decode(
            outputs["heatmaps"], outputs["offsets"],
            outputs["subpixel_alpha_logit"], outputs["fusion_weight_logit"],
            beta=softargmax_beta, radius=refine_radius)
    if decode_method == "taylor":
        return decode_ops.taylor_decode(outputs["heatmaps"])
    if decode_method == "softargmax":
        return decode_ops.soft_argmax(outputs["heatmaps"], softargmax_beta)
    return decode_ops.quarter_shift_decode(outputs["heatmaps"])


def flip_inference(
    apply_fn: Callable[..., Dict[str, jnp.ndarray]],
    variables,
    images: jnp.ndarray,
    flip_index: jnp.ndarray,
    head_type: str,
    decode_method: str = "quarter",
    shift_heatmap: bool = False,
    flip: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flip-test inference (ref models/pose_estimator.py:275-325).

    Runs forward on images and their horizontal mirror, flips the mirrored
    heatmaps back (swapping symmetric keypoint channels), averages, then
    decodes.  For the fusion head, offsets/alpha come from the unflipped
    pass — the reference's exact behavior.
    """
    outputs = apply_fn(variables, images, False)
    if not flip:
        return decode_outputs(outputs, head_type, decode_method)

    flipped = apply_fn(variables, images[:, :, ::-1, :], False)
    hm_f = decode_ops.flip_heatmaps(flipped["heatmaps"], flip_index,
                                    shift=shift_heatmap)
    avg = (outputs["heatmaps"] + hm_f) * 0.5
    merged = dict(outputs)
    merged["heatmaps"] = avg
    return decode_outputs(merged, head_type, decode_method)


def multiscale_flip_inference(
    apply_fn: Callable[..., Dict[str, jnp.ndarray]],
    variables,
    images: jnp.ndarray,
    flip_index: jnp.ndarray,
    head_type: str,
    scales: Tuple[float, ...] = (1.0,),
    decode_method: str = "quarter",
    shift_heatmap: bool = False,
    flip: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-scale + flip test-time augmentation.

    The reference's config surface declares a multi-scale test list
    (/root/reference/configs/default.yaml TEST section) without wiring it;
    implemented here: forward (+ flip) at each scale, bilinearly resize the
    resulting heatmaps back to the base resolution (sizes snapped to
    multiples of 32 so every backbone stride divides), average, decode once.
    """
    from .layers import resize_bilinear

    B, H, W, _ = images.shape
    base_outputs = None
    acc = None
    for s in scales:
        if s == 1.0:
            imgs_s = images
        else:
            hs = max(32, int(round(H * s / 32)) * 32)
            ws = max(32, int(round(W * s / 32)) * 32)
            imgs_s = resize_bilinear(images, hs, ws)
        outputs = apply_fn(variables, imgs_s, False)
        hm = outputs["heatmaps"]
        if flip:
            flipped = apply_fn(variables, imgs_s[:, :, ::-1, :], False)
            hm_f = decode_ops.flip_heatmaps(flipped["heatmaps"], flip_index,
                                            shift=shift_heatmap)
            hm = (hm + hm_f) * 0.5
        if base_outputs is None:
            base_outputs = dict(outputs)
            base_hw = hm.shape[1:3]
        if hm.shape[1:3] != base_hw:
            hm = resize_bilinear(hm, base_hw[0], base_hw[1])
        acc = hm if acc is None else acc + hm
    base_outputs["heatmaps"] = acc / float(len(scales))
    return decode_outputs(base_outputs, head_type, decode_method)


def count_params(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))

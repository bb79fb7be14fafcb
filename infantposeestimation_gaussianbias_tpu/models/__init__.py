"""Model zoo: backbones, heads, and the PoseEstimator assembly."""

from .heads import FusedHead, FusionHead, HeatmapHead, SimCCHead
from .hrformer import HRFormer, hrformer_base, hrformer_small
from .hrnet import HRNet, hrnet_w32, hrnet_w48
from .litehrnet import LiteHRNet, litehrnet
from .fold import fold_variables
from .quantize import quantize_model
from .pose_estimator import (
    BACKBONES,
    PoseEstimator,
    build_model,
    count_params,
    decode_outputs,
    flip_inference,
    serving_mode_supported,
    validate_serving_mode,
)

__all__ = [
    "BACKBONES",
    "FusedHead",
    "FusionHead",
    "HRFormer",
    "HRNet",
    "HeatmapHead",
    "LiteHRNet",
    "PoseEstimator",
    "SimCCHead",
    "build_model",
    "count_params",
    "decode_outputs",
    "serving_mode_supported",
    "validate_serving_mode",
    "flip_inference",
    "hrformer_base",
    "hrformer_small",
    "hrnet_w32",
    "hrnet_w48",
    "litehrnet",
    "fold_variables",
    "quantize_model",
]

"""Device-side numerical ops: affine warps, target generation, decoding."""

from .affine import (
    crop_and_normalize,
    get_affine_matrix,
    invert_affine,
    transform_points,
    warp_affine_batch,
    warp_affine_twopass,
)
from .decode import (
    argmax_decode,
    flip_heatmaps,
    fused_alpha_decode,
    fusion_decode,
    local_gaussian_refine,
    quarter_shift_decode,
    sample_at_coords,
    soft_argmax,
    subpixel_refine,
    taylor_decode,
    temporal_smooth,
    transform_preds,
    window_centroid_refine,
)
from .heatmap import generate_targets
from .photometric import color_jitter, color_jitter_normalized
from .quant import (
    QTensor,
    convert_tree,
    fold_batchnorm,
    quantize_act,
    quantize_weight,
    requantize,
)

__all__ = [
    "QTensor",
    "argmax_decode",
    "color_jitter",
    "color_jitter_normalized",
    "crop_and_normalize",
    "flip_heatmaps",
    "fused_alpha_decode",
    "fusion_decode",
    "generate_targets",
    "get_affine_matrix",
    "invert_affine",
    "local_gaussian_refine",
    "convert_tree",
    "fold_batchnorm",
    "quantize_act",
    "quantize_weight",
    "quarter_shift_decode",
    "requantize",
    "sample_at_coords",
    "soft_argmax",
    "subpixel_refine",
    "taylor_decode",
    "temporal_smooth",
    "transform_points",
    "transform_preds",
    "warp_affine_batch",
    "warp_affine_twopass",
    "window_centroid_refine",
]

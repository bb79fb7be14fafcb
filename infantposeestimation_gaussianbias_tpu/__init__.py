"""TPU-native top-down 2D pose estimation framework.

A ground-up JAX / XLA / Pallas rebuild of the capabilities of
MarkJhonBao/InfantPoseEstimation_GaussianBias: HRNet / HRFormer backbones,
heatmap + fusion (heatmap/offset/variance) heads, the six-term
Gaussian-constraint loss, sub-pixel decoding, COCO OKS/AP evaluation, and
the preterm-infant clinical pipeline — designed for TPU from the start
(NHWC layouts, fused jit steps, pjit data parallelism over a device mesh,
Pallas kernels for the hot ops).
"""

__version__ = "0.1.0"

from . import config, schemas
from .config import Config, get_config, get_variant

__all__ = ["Config", "config", "get_config", "get_variant", "schemas", "__version__"]

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

import os as _os

if _os.environ.get("IPE_PLATFORM"):
    # Deployment-environment escape hatch: site hooks may force a platform
    # (e.g. a TPU tunnel) in a way plain JAX_PLATFORMS cannot override;
    # jax.config.update applied before backend init always wins.  Lets any
    # CLI run on CPU with IPE_PLATFORM=cpu.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["IPE_PLATFORM"])

from . import config, schemas
from .config import Config, get_config, get_variant

__all__ = ["Config", "config", "get_config", "get_variant", "schemas", "__version__"]

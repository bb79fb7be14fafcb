"""Native (C++) host-loader: fused JPEG decode + affine crop.

See ``ipe_loader.cpp`` for the kernel and ``binding.py`` for the
ctypes interface + build-on-demand.  Import-safe everywhere: when the
toolchain or libjpeg is missing, ``available()`` is False and the pure
cv2 path is used instead.
"""

from .binding import (available, decode_rgb, decode_warp,
                      decode_warp_batch, has_png, image_dims, jpeg_dims,
                      load)

__all__ = ["available", "decode_rgb", "decode_warp", "decode_warp_batch",
           "has_png", "image_dims", "jpeg_dims", "load"]

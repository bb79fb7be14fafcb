"""ctypes binding + build-on-demand for the native host loader.

The shared library is compiled from ``ipe_loader.cpp`` with the system
g++ against libjpeg (no pybind11 in this environment; the C ABI +
ctypes keeps the binding dependency-free).  The build is cached next to
the source keyed by a source hash, so the first import after a source
change transparently rebuilds.  Every entry point degrades gracefully:
if g++ or libjpeg is unavailable, ``load()`` returns None and callers
fall back to the cv2 path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "ipe_loader.cpp")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _lib_path() -> str:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:12]
    return os.path.join(_DIR, f"_ipe_loader_{tag}.so")


def _build(path: str) -> bool:
    tmp = path + f".tmp{os.getpid()}"
    base = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
            _SRC]
    # libpng is optional: a host with g++/libjpeg but no libpng keeps
    # the full JPEG fast path (PNG falls back to cv2).
    for extra in (["-ljpeg", "-lpng", "-DIPE_HAVE_PNG"], ["-ljpeg"]):
        try:
            subprocess.run(base + extra + ["-o", tmp], check=True,
                           capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError):
            continue
        os.replace(tmp, path)  # atomic: concurrent builders race fine
        return True
    try:
        os.unlink(tmp)
    except OSError:
        pass
    return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("IPE_NATIVE_LOADER", "").lower() in ("0", "off"):
            return None
        try:
            path = _lib_path()
            if not os.path.exists(path) and not _build(path):
                return None
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.ipe_version.restype = ctypes.c_int
        lib.ipe_has_png.restype = ctypes.c_int
        lib.ipe_image_dims.restype = ctypes.c_int
        lib.ipe_image_dims.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.ipe_decode_rgb.restype = ctypes.c_int
        lib.ipe_decode_rgb.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_void_p]
        lib.ipe_decode_warp_batch.restype = ctypes.c_int
        lib.ipe_decode_warp_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def has_png() -> bool:
    """True when the build linked libpng (PNG decode supported)."""
    lib = load()
    return lib is not None and bool(lib.ipe_has_png())


def image_dims(data: bytes) -> Tuple[int, int]:
    """(width, height) from the JPEG/PNG header only."""
    lib = load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.ipe_image_dims(data, len(data), ctypes.byref(w),
                          ctypes.byref(h)):
        raise ValueError("not a decodable JPEG/PNG")
    return w.value, h.value


jpeg_dims = image_dims  # backwards-compatible alias


def decode_rgb(data: bytes) -> np.ndarray:
    """Full JPEG/PNG decode to an (H, W, 3) uint8 RGB array (PNG alpha
    composited over black)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    w, h = image_dims(data)
    out = np.empty((h, w, 3), np.uint8)
    if lib.ipe_decode_rgb(data, len(data), out.ctypes.data):
        raise ValueError("JPEG decode failed")
    return out


def decode_warp_batch(jpegs, mats: np.ndarray, out_size: Tuple[int, int],
                      nthreads: int = 0, fast: bool = False) -> np.ndarray:
    """Fused decode+warp: N JPEG/PNG byte strings + N forward 2x3 affines
    (source image -> crop, data/transforms.py convention) -> (N, H, W, 3)
    uint8 RGB crops.  ``out_size`` is (width, height) like
    DataConfig.input_size.  ``fast`` enables DCT-scaled decode (training
    aug only; numerically a different low-pass resample).

    Raises ValueError naming the first failed sample if any decode fails
    (matching PoseDataset._load_image's fail-fast contract).
    """
    lib = load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(jpegs)
    out_w, out_h = int(out_size[0]), int(out_size[1])
    mats = np.ascontiguousarray(mats, np.float32)
    if mats.shape != (n, 2, 3):
        raise ValueError(f"mats must be (n, 2, 3), got {mats.shape}")
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    if n == 0:
        return out
    bufs = (ctypes.c_char_p * n)(*jpegs)
    lens = (ctypes.c_long * n)(*[len(b) for b in jpegs])
    statuses = (ctypes.c_int * n)()
    failed = lib.ipe_decode_warp_batch(
        bufs, lens, mats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, out_w, out_h, out.ctypes.data, statuses, int(nthreads),
        int(bool(fast)))
    if failed:
        bad = [i for i in range(n) if statuses[i] != 0]
        raise ValueError(
            f"native decode+warp failed for {failed} sample(s), first at "
            f"index {bad[0]} (status {statuses[bad[0]]})")
    return out


def decode_warp(jpeg: bytes, mat: np.ndarray, out_size: Tuple[int, int],
                fast: bool = False) -> np.ndarray:
    """Single-sample decode+warp -> (H, W, 3) uint8 crop."""
    return decode_warp_batch([jpeg], np.asarray(mat, np.float32)[None],
                             out_size, nthreads=1, fast=fast)[0]

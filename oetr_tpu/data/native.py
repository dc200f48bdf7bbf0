"""ctypes bindings for the native C++ data service (native/dataservice.cpp).

Threaded JPEG decode + image preparation producing the same fixed-shape
arrays as data/images.py::prepare_image. Builds the shared library on
first use (g++, libjpeg — both baked into the image); falls back cleanly
when the toolchain is unavailable so the pure-Python path keeps working.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libodsdata.so")
_lib = None


def build_native(force: bool = False) -> str:
    """Compile native/libodsdata.so (make). Returns the library path."""
    if force or not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    return _LIB_PATH


def load_native():
    """Load (building if needed) the library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        path = build_native()
        lib = ctypes.CDLL(path)
    except (OSError, subprocess.CalledProcessError):
        return None

    lib.ods_jpeg_shape.restype = ctypes.c_int
    lib.ods_jpeg_shape.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.ods_decode_jpeg.restype = ctypes.c_int
    lib.ods_prepare_image.restype = ctypes.c_int
    lib.ods_prepare_batch.restype = ctypes.c_int
    _lib = lib
    return lib


def native_available() -> bool:
    return load_native() is not None


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> RGB uint8 [H, W, 3]."""
    lib = load_native()
    if lib is None:
        raise RuntimeError("native data service unavailable")
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.ods_jpeg_shape(data, len(data), ctypes.byref(h),
                            ctypes.byref(w))
    if rc != 0:
        raise ValueError("not a JPEG")
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.ods_decode_jpeg(
        data, len(data), out.ctypes.data_as(ctypes.c_void_p),
        h.value, w.value)
    if rc != 0:
        raise ValueError(f"decode failed rc={rc}")
    return out


def prepare_batch_native(paths: list[str], canvas_hw: tuple[int, int],
                         oetr_hw: tuple[int, int] = (640, 640),
                         resize_max: int | None = 1024,
                         n_threads: int = 0) -> dict:
    """Threaded batch preparation. Returns dict of stacked arrays
    (canvas [N,H,W,3] f32, valid_hw [N,2] i32, oetr_image [N,h,w,3] f32,
    oetr_scale [N,2] f32, scale_to_orig [N,2] f32)."""
    lib = load_native()
    if lib is None:
        raise RuntimeError("native data service unavailable")
    n = len(paths)
    ch, cw = canvas_hw
    oh, ow = oetr_hw
    canvases = np.empty((n, ch, cw, 3), np.float32)
    valid_hw = np.empty((n, 2), np.int32)
    oetr_imgs = np.empty((n, oh, ow, 3), np.float32)
    oetr_scales = np.empty((n, 2), np.float32)
    scale_to_origs = np.empty((n, 2), np.float32)
    blob = b"".join(p.encode() + b"\x00" for p in paths)
    failures = lib.ods_prepare_batch(
        blob, n, ch, cw, oh, ow,
        -1 if resize_max is None else resize_max, n_threads,
        canvases.ctypes.data_as(ctypes.c_void_p),
        valid_hw.ctypes.data_as(ctypes.c_void_p),
        oetr_imgs.ctypes.data_as(ctypes.c_void_p),
        oetr_scales.ctypes.data_as(ctypes.c_void_p),
        scale_to_origs.ctypes.data_as(ctypes.c_void_p))
    if failures:
        raise RuntimeError(f"{failures}/{n} images failed to load")
    return {
        "canvas": canvases, "valid_hw": valid_hw, "oetr_image": oetr_imgs,
        "oetr_scale": oetr_scales, "scale_to_orig": scale_to_origs,
    }

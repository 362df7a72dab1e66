"""ctypes bindings for the native C++ encoder (`native/encoder.cpp`).

The native library is optional: `available()` is False when it hasn't been
built (`make -C native`) and `io.image` falls back to the pure-Python
encoders, which produce byte-identical files.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_native",
                         "libencoder.so")
_lib = None


def _load():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.rmr_linear_to_srgb_u8.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64]
        lib.rmr_write_bmp.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32, ctypes.c_int32]
        lib.rmr_write_bmp.restype = ctypes.c_int32
        lib.rmr_write_png.argtypes = lib.rmr_write_bmp.argtypes
        lib.rmr_write_png.restype = ctypes.c_int32
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def linear_to_srgb_u8(linear: np.ndarray) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(linear, np.float32)
    out = np.empty(src.shape, np.uint8)
    lib.rmr_linear_to_srgb_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(src.size))
    return out


def _check(rc: int, path: str):
    if rc != 0:
        raise IOError(f"native encoder failed ({rc}) writing {path}")


def write_bmp(path: str, rgb_u8: np.ndarray) -> None:
    lib = _load()
    h, w, _ = rgb_u8.shape
    buf = np.ascontiguousarray(rgb_u8, np.uint8)
    _check(lib.rmr_write_bmp(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w, h), path)


def write_png(path: str, rgb_u8: np.ndarray) -> None:
    lib = _load()
    h, w, _ = rgb_u8.shape
    buf = np.ascontiguousarray(rgb_u8, np.uint8)
    _check(lib.rmr_write_png(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w, h), path)

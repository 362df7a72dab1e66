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
_HDR_PATH = os.path.join(os.path.dirname(__file__), "_native", "libhdr.so")
_lib = None
_hdr_lib = None


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


def _load_hdr():
    global _hdr_lib
    if _hdr_lib is None and os.path.exists(_HDR_PATH):
        lib = ctypes.CDLL(_HDR_PATH)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.rmr_hdr_probe.argtypes = [
            u8p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64)]
        lib.rmr_hdr_probe.restype = ctypes.c_int32
        lib.rmr_hdr_decode.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
        lib.rmr_hdr_decode.restype = ctypes.c_int32
        _hdr_lib = lib
    return _hdr_lib


def available_hdr() -> bool:
    return _load_hdr() is not None


def decode_hdr(data: bytes) -> np.ndarray:
    """Decode an in-memory Radiance .hdr file -> (H, W, 3) linear float32."""
    lib = _load_hdr()
    buf = np.frombuffer(data, np.uint8)
    src = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    pos = ctypes.c_int64()
    rc = lib.rmr_hdr_probe(src, len(data), ctypes.byref(w), ctypes.byref(h),
                           ctypes.byref(pos))
    if rc != 0:
        raise ValueError(f"native HDR probe failed ({rc})")
    out = np.empty((h.value, w.value, 3), np.float32)
    rc = lib.rmr_hdr_decode(
        src, len(data), w.value, h.value, pos.value,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise ValueError(f"native HDR decode failed ({rc})")
    return out

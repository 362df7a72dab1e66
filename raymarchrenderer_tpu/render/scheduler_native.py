"""ctypes bindings for the native C++ render scheduler
(`native/scheduler.cpp`) — the host-runtime twin of the reference's
`Program.cpp:107-299` spiral walk + progressive work queue.

Optional: `available()` is False until `make -C native` has been run;
`render.tiles` falls back to the pure-Python implementation, which emits an
identical schedule (asserted in `tests/test_native.py`)."""
from __future__ import annotations

import ctypes
import os
from typing import Iterator, List, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(__file__)), "io",
                         "_native", "libscheduler.so")
_lib = None


def _load():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.rmr_spiral_order.argtypes = [ctypes.c_int32, ctypes.c_int32,
                                         i32p]
        lib.rmr_spiral_order.restype = ctypes.c_int32
        lib.rmr_sched_create.argtypes = [ctypes.c_int32, ctypes.c_int32,
                                         ctypes.c_int32]
        lib.rmr_sched_create.restype = ctypes.c_void_p
        lib.rmr_sched_next.argtypes = [ctypes.c_void_p, i32p]
        lib.rmr_sched_next.restype = ctypes.c_int32
        lib.rmr_sched_cancel.argtypes = [ctypes.c_void_p]
        lib.rmr_sched_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def spiral_order(grid_w: int, grid_h: int) -> List[Tuple[int, int]]:
    """Full spiral visit order from the native library."""
    lib = _load()
    out = np.empty(2 * grid_w * grid_h, np.int32)
    n = lib.rmr_spiral_order(
        grid_w, grid_h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return [(int(out[2 * i]), int(out[2 * i + 1])) for i in range(n)]


class NativeScheduler:
    """Progressive work queue: yields (tile_x, tile_y, sample) units.

    spp > 0: finite mode — every sample of a tile before the spiral
    advances.  spp == 0: endless mode — one sample per tile per pass,
    forever (the reference's samples==0 loop); `cancel()` ends it while
    keeping the accumulation valid."""

    def __init__(self, grid_w: int, grid_h: int, spp: int):
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError("native scheduler not built (make -C native)")
        self._h = self._lib.rmr_sched_create(grid_w, grid_h, spp)
        if not self._h:
            raise ValueError(f"bad scheduler args ({grid_w}, {grid_h}, {spp})")

    def __iter__(self) -> Iterator[Tuple[int, int, int]]:
        out = (ctypes.c_int32 * 3)()
        while self._lib.rmr_sched_next(self._h, out):
            yield (out[0], out[1], out[2])

    def cancel(self) -> None:
        self._lib.rmr_sched_cancel(self._h)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.rmr_sched_destroy(self._h)
            self._h = None

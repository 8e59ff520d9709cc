"""ctypes binding for the native data plane (native/dataplane.cpp).

Builds the shared library on first use if the toolchain is available;
callers fall back to the Python (cv2/numpy) path when it is not.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

from .transforms import IMAGENET_MEAN, IMAGENET_STD

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libdataplane.so"))
_lib = None
_lib_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True, timeout=120)
        return os.path.isfile(_LIB_PATH)
    except Exception:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.isfile(_LIB_PATH) and not _build():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.dp_create.restype = ctypes.c_void_p
        lib.dp_create.argtypes = [ctypes.c_int]
        lib.dp_destroy.argtypes = [ctypes.c_void_p]
        lib.dp_decode_sync.restype = ctypes.c_int
        lib.dp_decode_sync.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_int)]
        try:    # absent in pre-u8 builds of the .so; rebuild via `make -C native`
            lib.dp_decode_sync_u8.restype = ctypes.c_int
            lib.dp_decode_sync_u8.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
                ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_int)]
            lib._has_u8 = True
        except AttributeError:
            lib._has_u8 = False
        lib.dp_submit.restype = ctypes.c_int
        lib.dp_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_ubyte)]
        lib.dp_wait.restype = ctypes.c_int
        lib.dp_wait.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


def available() -> bool:
    return load_library() is not None


_MEAN = (ctypes.c_float * 3)(*IMAGENET_MEAN.tolist())
_STD = (ctypes.c_float * 3)(*IMAGENET_STD.tolist())


def decode_sync(path: str, short_side: int, max_side: int,
                canvas_hw: Tuple[int, int]):
    """Fused decode+resize+normalize+pad. Returns (canvas f32 HWC,
    mask bool HW, (ori_h, ori_w), (new_h, new_w)) or None on failure."""
    lib = load_library()
    if lib is None:
        return None
    h, w = canvas_hw
    canvas = np.empty((h, w, 3), np.float32)
    mask = np.empty((h, w), np.uint8)
    dims = (ctypes.c_int * 4)()
    rc = lib.dp_decode_sync(
        path.encode(), short_side, max_side, h, w, _MEAN, _STD,
        canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), dims)
    if rc != 0:
        return None
    return canvas, mask.astype(bool), (dims[0], dims[1]), (dims[2], dims[3])


def decode_sync_u8(path: str, short_side: int, max_side: int,
                   canvas_hw: Tuple[int, int]):
    """Fused decode+resize+pad, raw RGB uint8 (normalize-on-device path).
    Returns (canvas u8 HWC, mask bool HW, (ori_h, ori_w), (new_h, new_w))
    or None on failure / pre-u8 library build."""
    lib = load_library()
    if lib is None or not getattr(lib, "_has_u8", False):
        return None
    h, w = canvas_hw
    canvas = np.empty((h, w, 3), np.uint8)
    mask = np.empty((h, w), np.uint8)
    dims = (ctypes.c_int * 4)()
    rc = lib.dp_decode_sync_u8(
        path.encode(), short_side, max_side, h, w,
        canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), dims)
    if rc != 0:
        return None
    return canvas, mask.astype(bool), (dims[0], dims[1]), (dims[2], dims[3])


class AsyncDecoder:
    """Worker-pool decoder: submit paths ahead, collect in order."""

    def __init__(self, num_threads: int = 4):
        self.lib = load_library()
        if self.lib is None:
            raise RuntimeError("native data plane unavailable")
        self.handle = self.lib.dp_create(num_threads)
        self._next_id = 0
        self._bufs = {}

    def submit(self, path: str, short_side: int, max_side: int,
               canvas_hw: Tuple[int, int]) -> int:
        h, w = canvas_hw
        canvas = np.empty((h, w, 3), np.float32)
        mask = np.empty((h, w), np.uint8)
        job = self._next_id
        self._next_id += 1
        rc = self.lib.dp_submit(
            self.handle, job, path.encode(), short_side, max_side, h, w,
            _MEAN, _STD,
            canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
        if rc != 0:
            raise RuntimeError("dp_submit failed")
        self._bufs[job] = (canvas, mask)
        return job

    def wait(self, job: int):
        dims = (ctypes.c_int * 4)()
        rc = self.lib.dp_wait(self.handle, job, dims)
        canvas, mask = self._bufs.pop(job)
        if rc != 0:
            return None
        return canvas, mask.astype(bool), (dims[0], dims[1]), (dims[2], dims[3])

    def close(self):
        if self.handle:
            self.lib.dp_destroy(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

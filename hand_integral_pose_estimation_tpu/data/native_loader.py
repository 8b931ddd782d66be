"""ctypes binding for the native C++ IO loader (native/hipe_io.cpp).

Replaces the reference's multiprocess torch DataLoader workers
(common/base.py:141-145) with a C++ thread pool that decodes JPEG batches
into fixed-shape RGB buffers, with submit/wait double buffering so host
decode overlaps device compute. Falls back to cv2 when the shared library
cannot be built (`NativeLoader.available`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhipe_io.so")


def _build_library() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


_lib: Optional[ctypes.CDLL] = None


def load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build_library():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.hipe_loader_create.restype = ctypes.c_void_p
    lib.hipe_loader_create.argtypes = [ctypes.c_int] * 4
    lib.hipe_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.hipe_decode_jpeg.restype = ctypes.c_int
    lib.hipe_decode_jpeg.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int]
    lib.hipe_loader_submit.restype = ctypes.c_int
    lib.hipe_loader_submit.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int]
    lib.hipe_loader_wait.restype = ctypes.c_int
    lib.hipe_loader_wait.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
    _lib = lib
    return lib


def decode_jpeg(path: str, height: int = 224, width: int = 224
                ) -> np.ndarray:
    """Decode one JPEG to an RGB (height, width, 3) uint8 array."""
    lib = load_library()
    out = np.empty((height, width, 3), np.uint8)
    if lib is None:
        import cv2
        img = cv2.imread(path, cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION)
        if img.shape[:2] != (height, width):
            img = cv2.resize(img, (width, height))
        return img[:, :, ::-1].copy()
    rc = lib.hipe_decode_jpeg(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        height, width)
    if rc != 0:
        raise IOError(f"hipe_decode_jpeg({path}) -> {rc}")
    return out


class NativeLoader:
    """Double-buffered batch prefetcher.

    Usage::

        loader = NativeLoader(batch=32)
        loader.submit(paths0)
        while ...:
            loader.submit(next_paths)      # decode overlaps device step
            batch = loader.wait()          # (B, H, W, 3) uint8 RGB
    """

    def __init__(self, batch: int, height: int = 224, width: int = 224,
                 num_threads: Optional[int] = None):
        self.batch = batch
        self.height = height
        self.width = width
        self._lib = load_library()
        self.available = self._lib is not None
        self._pending: Optional[Sequence[str]] = None
        if self.available:
            self._handle = self._lib.hipe_loader_create(
                num_threads or min(os.cpu_count() or 8, 16), height, width,
                batch)
        else:
            self._handle = None

    def submit(self, paths: Sequence[str]) -> None:
        assert len(paths) <= self.batch
        if not self.available:
            self._pending = list(paths)
            return
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        rc = self._lib.hipe_loader_submit(self._handle, arr, len(paths))
        if rc != 0:
            raise RuntimeError("a batch is already in flight")
        self._pending = list(paths)

    def wait(self) -> np.ndarray:
        assert self._pending is not None, "no batch submitted"
        n = len(self._pending)
        if not self.available:
            out = np.stack([decode_jpeg(p, self.height, self.width)
                            for p in self._pending])
            self._pending = None
            return out
        out = np.empty((self.batch, self.height, self.width, 3), np.uint8)
        errs = self._lib.hipe_loader_wait(
            self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if errs:
            raise IOError(f"{errs} decode errors in batch")
        self._pending = None
        return out[:n]

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib is not None:
            self._lib.hipe_loader_destroy(self._handle)

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
    lib.hipe_loader_create_yuv420.restype = ctypes.c_void_p
    lib.hipe_loader_create_yuv420.argtypes = [ctypes.c_int] * 4
    lib.hipe_decode_jpeg_yuv420.restype = ctypes.c_int
    lib.hipe_decode_jpeg_yuv420.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int]
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


def decode_jpeg_yuv420(path: str, height: int = 224, width: int = 224
                       ) -> np.ndarray:
    """Decode one 4:2:0 JPEG to its packed planar representation.

    Returns (height*width*3//2,) uint8: the Y plane, then Cb (h/2, w/2),
    then Cr — finish on-device with ops.yuv.yuv420_to_rgb (bitwise equal to
    the full RGB decode). Raises if the file is not a (height, width) 4:2:0
    JPEG or the native library is unavailable (no cv2 fallback can produce
    the pre-upsample planes).
    """
    lib = load_library()
    if lib is None:
        raise RuntimeError("native loader unavailable; YUV 4:2:0 decode "
                           "has no cv2 fallback")
    out = np.empty((height * width * 3 // 2,), np.uint8)
    rc = lib.hipe_decode_jpeg_yuv420(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        height, width)
    if rc != 0:
        raise IOError(f"hipe_decode_jpeg_yuv420({path}) -> {rc} "
                      "(-3 = not a matching 4:2:0 JPEG)")
    return out


class NativeLoader:
    """Double-buffered batch prefetcher.

    Usage::

        loader = NativeLoader(batch=32)
        loader.submit(paths0)
        while ...:
            loader.submit(next_paths)      # decode overlaps device step
            batch = loader.wait()          # (B, H, W, 3) uint8 RGB

    With ``layout="yuv420"`` batches stay in the file's own subsampled
    planar form — (B, H*W*3//2) uint8, 2x fewer bytes to ship — and the
    consumer finishes the decode on-device via ops.yuv.yuv420_to_rgb.
    YUV mode requires the native library (no cv2 fallback) and every file
    to be a (H, W) 4:2:0 JPEG.
    """

    def __init__(self, batch: int, height: int = 224, width: int = 224,
                 num_threads: Optional[int] = None, layout: str = "rgb"):
        assert layout in ("rgb", "yuv420"), layout
        self.batch = batch
        self.height = height
        self.width = width
        self.layout = layout
        self._lib = load_library()
        self.available = self._lib is not None
        self._pending: Optional[Sequence[str]] = None
        if layout == "yuv420" and not self.available:
            raise RuntimeError("layout='yuv420' requires the native library")
        if self.available:
            threads = num_threads or min(os.cpu_count() or 8, 16)
            if layout == "yuv420":
                self._handle = self._lib.hipe_loader_create_yuv420(
                    threads, height, width, batch)
            else:
                self._handle = self._lib.hipe_loader_create(
                    threads, height, width, batch)
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
        if self.layout == "yuv420":
            out = np.empty((self.batch, self.height * self.width * 3 // 2),
                           np.uint8)
        else:
            out = np.empty((self.batch, self.height, self.width, 3),
                           np.uint8)
        errs = self._lib.hipe_loader_wait(
            self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if errs:
            raise IOError(f"{errs} decode errors in batch")
        self._pending = None
        return out[:n]

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib is not None:
            self._lib.hipe_loader_destroy(self._handle)

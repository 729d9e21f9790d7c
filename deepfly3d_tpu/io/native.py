"""ctypes bindings for the native ingest runtime (native/ingest.cpp).

Provides a multithreaded libjpeg batch decoder and an in-process libav
streaming video decoder — the TPU-native replacements for the reference's
torch DataLoader ingest and ffmpeg subprocess expansion (SURVEY §2.3
N2/N3/N12).  Falls back to OpenCV transparently when the shared library has
not been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libdf3d_ingest.so",
)

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.df3d_decode_jpeg_batch.restype = ctypes.c_int
    lib.df3d_decode_jpeg_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.df3d_video_open.restype = ctypes.c_void_p
    lib.df3d_video_open.argtypes = [ctypes.c_char_p]
    lib.df3d_video_width.restype = ctypes.c_int
    lib.df3d_video_width.argtypes = [ctypes.c_void_p]
    lib.df3d_video_height.restype = ctypes.c_int
    lib.df3d_video_height.argtypes = [ctypes.c_void_p]
    lib.df3d_video_fps.restype = ctypes.c_double
    lib.df3d_video_fps.argtypes = [ctypes.c_void_p]
    lib.df3d_video_read.restype = ctypes.c_int
    lib.df3d_video_read.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
    lib.df3d_video_close.restype = None
    lib.df3d_video_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def decode_jpeg_batch(
    paths: Sequence[str], height: int, width: int, num_threads: int = 16
) -> np.ndarray:
    """Decode JPEGs into one contiguous (N, H, W, 3) uint8 RGB buffer."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native ingest library not built (make -C native)")
    n = len(paths)
    out = np.empty((n, height, width, 3), dtype=np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.df3d_decode_jpeg_batch(
        arr,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        height,
        width,
        num_threads,
    )
    if failures:
        raise IOError(f"native JPEG decode failed for {failures}/{n} files")
    return out


class VideoReader:
    """Streaming in-process video decode (RGB uint8 frames)."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native ingest library not built (make -C native)")
        self._lib = lib
        self._handle = lib.df3d_video_open(path.encode())
        if not self._handle:
            raise IOError(f"cannot open video: {path}")
        self.width = lib.df3d_video_width(self._handle)
        self.height = lib.df3d_video_height(self._handle)
        self.fps = lib.df3d_video_fps(self._handle)

    def read(self) -> Optional[np.ndarray]:
        frame = np.empty((self.height, self.width, 3), dtype=np.uint8)
        ret = self._lib.df3d_video_read(
            self._handle, frame.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        )
        if ret == 1:
            return frame
        if ret == 0:
            return None
        raise IOError(f"video decode error ({ret})")

    def __iter__(self):
        while True:
            frame = self.read()
            if frame is None:
                return
            yield frame

    def close(self):
        if self._handle:
            self._lib.df3d_video_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

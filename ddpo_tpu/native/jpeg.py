"""ctypes binding for the native JPEG compressibility scorer.

``jpeg_sizes`` dispatches to the C++ library (batch-parallel libjpeg) and
falls back to per-image PIL encoding if the toolchain/libjpeg is missing, so
the reward is always available; the native path is an order of magnitude
faster at sampling-batch scale (see tests/test_native.py for the parity
check and bench_jpeg.py numbers).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_lib = None
_load_error: Optional[Exception] = None


def _get_lib():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        from ddpo_tpu.native.build import build

        path = build()
        lib = ctypes.CDLL(path)
        lib.jpeg_sizes.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.jpeg_sizes.restype = ctypes.c_int
        _lib = lib
    except Exception as e:  # toolchain or libjpeg missing
        _load_error = e
    return _lib


def _to_uint8_batch(images: np.ndarray) -> np.ndarray:
    images = np.asarray(images)
    if images.dtype != np.uint8:
        assert np.abs(images).max() <= 1.0 + 1e-5
        images = (np.clip(images, 0, 1) * 255).astype(np.uint8)
    return np.ascontiguousarray(images)


def jpeg_sizes_native(images: np.ndarray, quality: int = 95,
                      n_threads: Optional[int] = None) -> np.ndarray:
    """(N, H, W, 3) images -> encoded sizes in bytes via the C++ library."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError(f"native jpeg library unavailable: {_load_error}")
    images = _to_uint8_batch(images)
    n, h, w, c = images.shape
    assert c == 3
    out = np.zeros(n, dtype=np.int64)
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 16)
    rc = lib.jpeg_sizes(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, quality, n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        raise RuntimeError(f"jpeg_sizes failed with code {rc}")
    return out


def jpeg_sizes(images: np.ndarray, quality: int = 95) -> np.ndarray:
    """Encoded JPEG sizes in bytes; native path with PIL fallback."""
    if _get_lib() is not None:
        return jpeg_sizes_native(images, quality=quality)
    from ddpo_tpu.utils.images import encode_jpeg

    return np.array(
        [len(encode_jpeg(img, quality=quality)) for img in images], dtype=np.int64
    )

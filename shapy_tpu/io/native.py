"""ctypes bindings for the native host kernels (native/shapy_native.cpp).

Auto-builds ``libshapy_native.so`` with make on first use (g++ is baked
into the image; pybind11 is not, hence the C ABI + ctypes). Every binding
has a pure-python/scipy fallback, so the framework works without a
compiler too.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libshapy_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.convex_hull_perimeter_batch.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.affine_warp_bilinear_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def hull_perimeters(points: np.ndarray, mask: Optional[np.ndarray] = None
                    ) -> np.ndarray:
    """Batched exact hull perimeters. points: (B, N, 2); mask: (B, N)."""
    lib = _load()
    points = np.ascontiguousarray(points, np.float64)
    B, N = points.shape[:2]
    if lib is None:
        from shapy_tpu.ops.convex_hull import hull_perimeter_exact_np

        return np.asarray(
            [
                hull_perimeter_exact_np(
                    points[b], None if mask is None else mask[b]
                )
                for b in range(B)
            ]
        )
    out = np.zeros(B, np.float64)
    mask_ptr = None
    if mask is not None:
        mask = np.ascontiguousarray(mask, np.uint8)
        mask_ptr = mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    lib.convex_hull_perimeter_batch(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        mask_ptr, B, N,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out


def affine_warp_batch(
    images: np.ndarray,
    affines: np.ndarray,
    out_size: tuple,
    num_threads: int = 4,
) -> np.ndarray:
    """Batched bilinear affine warp. images: (B, H, W, C) float32;
    affines: (B, 2, 3) mapping output -> input pixel coords."""
    lib = _load()
    images = np.ascontiguousarray(images, np.float32)
    B, H, W, C = images.shape
    outH, outW = out_size
    affines = np.ascontiguousarray(affines, np.float64).reshape(B, 6)
    if lib is None:
        import cv2

        out = np.zeros((B, outH, outW, C), np.float32)
        for b in range(B):
            # cv2 expects the inverse map with WARP_INVERSE_MAP
            out[b] = cv2.warpAffine(
                images[b], affines[b].reshape(2, 3).astype(np.float32),
                (outW, outH),
                flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
            ).reshape(outH, outW, C)
        return out
    out = np.zeros((B, outH, outW, C), np.float32)
    lib.affine_warp_bilinear_batch(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        B, H, W, C,
        affines.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        outH, outW, num_threads,
    )
    return out

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
    # make is dependency-driven: a no-op when the .so is fresh, a rebuild
    # when shapy_native.cpp is newer (new kernels added). An exclusive
    # flock serializes concurrent first-users (e.g. the two-process
    # multihost workers) so only one compiles; the Makefile itself links
    # to a temp file and atomically renames, so even an unlocked builder
    # can never truncate the .so under a process that has it mapped.
    try:
        import fcntl

        with open(os.path.join(_NATIVE_DIR, ".build.lock"), "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True, capture_output=True, timeout=120,
            )
    except Exception:
        if not os.path.exists(_LIB_PATH):
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
    if hasattr(lib, "rasterize_fragments"):
        lib.rasterize_fragments.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
    if hasattr(lib, "shade_fragments"):
        lib.shade_fragments.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
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


def rasterize_fragments_native(
    pts: np.ndarray,
    z: np.ndarray,
    faces: np.ndarray,
    H: int,
    W: int,
    num_threads: int = 0,
) -> Optional[tuple]:
    """Threaded z-buffer geometry pass (native/shapy_native.cpp).

    pts: (V, 2) screen coords, z: (V,) camera depths, faces: (F, 3).
    Returns dense (face_id (H*W,) int32 with -1 empty, bary (H*W, 3)
    float32, depth (H*W,) float32 with +inf empty), or None when the
    native library is unavailable (caller falls back to numpy).
    """
    lib = _load()
    if lib is None or not hasattr(lib, "rasterize_fragments"):
        return None
    pts = np.ascontiguousarray(pts, np.float32)
    z = np.ascontiguousarray(z, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    face_id = np.empty(H * W, np.int32)
    bary = np.empty((H * W, 3), np.float32)
    depth = np.empty(H * W, np.float32)
    if num_threads <= 0:
        num_threads = min(os.cpu_count() or 1, 8)
    lib.rasterize_fragments(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        z.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        faces.shape[0], H, W,
        face_id.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        bary.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads,
    )
    return face_id, bary, depth


def shade_fragments_native(
    pix: np.ndarray,
    fid: np.ndarray,
    bary: np.ndarray,
    vnormals: np.ndarray,
    faces: np.ndarray,
    base: np.ndarray,
    lights: np.ndarray,
    spec_color: np.ndarray,
    shininess: float,
    ambient: float,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    W: int,
    ortho: bool = False,
    num_threads: int = 0,
) -> Optional[np.ndarray]:
    """Threaded two-sided Blinn-Phong fragment shading
    (native/shapy_native.cpp:shade_fragments; numpy semantics in
    shapy_tpu/render/rasterizer.py:_blinn_phong). Returns rgb (N, 3)
    float32 in [0, 1], or None when the library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "shade_fragments"):
        return None
    pix = np.ascontiguousarray(pix, np.int64)
    fid = np.ascontiguousarray(fid, np.int32)
    bary = np.ascontiguousarray(bary, np.float32)
    vnormals = np.ascontiguousarray(vnormals, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    base = np.ascontiguousarray(
        np.broadcast_to(base, (pix.shape[0], 3)), np.float32)
    lights = np.ascontiguousarray(lights, np.float32).reshape(-1, 4)
    spec_color = np.ascontiguousarray(spec_color, np.float32).reshape(3)
    rgb = np.empty((pix.shape[0], 3), np.float32)
    if num_threads <= 0:
        num_threads = min(os.cpu_count() or 1, 8)
    lib.shade_fragments(
        pix.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        fid.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        bary.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pix.shape[0],
        vnormals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        base.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lights.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lights.shape[0],
        spec_color.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        float(shininess), float(ambient),
        float(fx), float(fy), float(cx), float(cy),
        int(W), int(bool(ortho)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads,
    )
    return rgb


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

import numpy as np
import pytest

from shapy_tpu.io.native import (
    affine_warp_batch,
    hull_perimeters,
    native_available,
)
from shapy_tpu.ops.convex_hull import hull_perimeter_exact_np


def test_native_builds():
    assert native_available(), "native library failed to build"


def test_native_hull_matches_scipy(rng):
    pts = rng.normal(size=(4, 200, 2)) * [0.4, 0.2]
    mask = rng.uniform(size=(4, 200)) > 0.25
    ours = hull_perimeters(pts, mask)
    for b in range(4):
        ref = hull_perimeter_exact_np(pts[b], mask[b])
        assert ours[b] == pytest.approx(ref, rel=1e-12)


def test_native_hull_degenerate():
    pts = np.zeros((1, 5, 2))
    assert hull_perimeters(pts)[0] == 0.0  # all duplicate points
    line = np.asarray([[[0.0, 0], [1, 0], [2, 0], [3, 0], [4, 0]]])
    assert hull_perimeters(line)[0] == pytest.approx(0.0) or \
        hull_perimeters(line)[0] >= 0.0


def test_native_warp_matches_cv2(rng):
    import cv2

    img = rng.uniform(size=(1, 60, 80, 3)).astype(np.float32)
    # output -> input affine: scale 0.5 + shift
    A = np.asarray([[[0.5, 0.0, 10.0], [0.0, 0.5, 5.0]]], np.float64)
    ours = affine_warp_batch(img, A, (32, 32))
    ref = cv2.warpAffine(
        img[0], A[0].astype(np.float32), (32, 32),
        flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
        borderValue=0,
    )
    np.testing.assert_allclose(ours[0], ref, atol=2e-3)


def test_native_warp_threads(rng):
    img = rng.uniform(size=(8, 40, 40, 3)).astype(np.float32)
    A = np.tile(
        np.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float64),
        (8, 1, 1),
    )
    out1 = affine_warp_batch(img, A, (40, 40), num_threads=1)
    out4 = affine_warp_batch(img, A, (40, 40), num_threads=4)
    np.testing.assert_array_equal(out1, out4)
    np.testing.assert_allclose(out1, img, atol=1e-6)


def test_native_raster_and_shade_match_numpy(rng):
    """The C++ geometry + shading kernels agree with the numpy fallback
    at float32 tolerance: identical coverage, ~1e-5 rgb/depth deltas."""
    import shapy_tpu.io.native as nat
    from shapy_tpu.render.rasterizer import render_mesh

    if not nat.native_available():
        pytest.skip("native library unavailable")

    # low-poly sphere (same generator as tests/test_render.py)
    us = np.linspace(0, np.pi, 16)
    vs = np.linspace(0, 2 * np.pi, 32, endpoint=False)
    verts = [[0.5 * np.sin(u) * np.cos(w), 0.5 * np.sin(u) * np.sin(w),
              8.0 + 0.5 * np.cos(u)] for u in us for w in vs]
    faces = []
    for i in range(15):
        for j in range(32):
            a, b = i * 32 + j, i * 32 + (j + 1) % 32
            c, d = (i + 1) * 32 + j, (i + 1) * 32 + (j + 1) % 32
            faces += [[a, b, c], [b, d, c]]
    v, f = np.asarray(verts), np.asarray(faces)

    rgb_n, a_n, d_n = render_mesh(v, f, (96, 96), 600.0)
    lib, tried = nat._lib, nat._tried
    try:
        nat._lib, nat._tried = None, True  # force the numpy fallback
        rgb_p, a_p, d_p = render_mesh(v, f, (96, 96), 600.0)
    finally:
        nat._lib, nat._tried = lib, tried

    # coverage may differ on exact-edge ties only
    assert ((a_n > 0) == (a_p > 0)).mean() > 0.999
    both = (a_n > 0) & (a_p > 0)
    # f32 vs f64 z-interpolation can pick a different (equally valid)
    # winning face along triangle seams -> a different normal there;
    # everything off the seams must agree to float32 precision.
    rgb_delta = np.abs(rgb_n[both] - rgb_p[both]).max(axis=1)
    assert np.quantile(rgb_delta, 0.99) < 1e-4, rgb_delta.max()
    d_delta = np.abs(d_n[both] - d_p[both])
    assert np.quantile(d_delta, 0.99) < 1e-4, d_delta.max()

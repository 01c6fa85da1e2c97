"""Rasterizer tests: overlay correctness and smooth-shading quality."""
import numpy as np

from shapy_tpu.render.rasterizer import (
    rasterize_mesh,
    render_mesh_overlay,
    weak_persp_to_blender,
)


def _uv_sphere(n=24, r=0.5, z0=10.0):
    us = np.linspace(0, np.pi, n)
    vs = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
    verts, faces = [], []
    for i, u in enumerate(us):
        for j, v in enumerate(vs):
            verts.append([r * np.sin(u) * np.cos(v),
                          r * np.sin(u) * np.sin(v),
                          z0 + r * np.cos(u)])
    m = len(vs)
    for i in range(n - 1):
        for j in range(m):
            a, b = i * m + j, i * m + (j + 1) % m
            c, d = (i + 1) * m + j, (i + 1) * m + (j + 1) % m
            faces += [[a, b, c], [b, d, c]]
    return np.asarray(verts), np.asarray(faces)


def test_rasterize_sphere_modes():
    v, f = _uv_sphere()
    for mode in ("flat", "smooth"):
        shading, mask = rasterize_mesh(v, f, (128, 128), focal_length=800.0,
                                       shading_mode=mode)
        assert mask.any()
        assert shading[mask].min() >= 0.0 and shading[mask].max() <= 1.0
    # same silhouette regardless of shading mode
    _, m1 = rasterize_mesh(v, f, (128, 128), 800.0, shading_mode="flat")
    _, m2 = rasterize_mesh(v, f, (128, 128), 800.0, shading_mode="smooth")
    np.testing.assert_array_equal(m1, m2)


def test_smooth_shading_is_smoother_than_flat():
    """Gouraud interpolation removes faceting: interior pixel-to-pixel
    shade jumps shrink vs flat shading (pyrender-overlay look)."""
    v, f = _uv_sphere()

    def interior_jumps(mode):
        s, m = rasterize_mesh(v, f, (128, 128), 800.0, shading_mode=mode)
        inner = m[:, 1:] & m[:, :-1]
        return np.abs(np.diff(s, axis=1))[inner]

    flat = interior_jumps("flat")
    smooth = interior_jumps("smooth")
    assert smooth.mean() < 0.75 * flat.mean()
    # faceting shows up in the tail: the large per-face jumps vanish
    assert np.percentile(smooth, 99) < 0.6 * np.percentile(flat, 99)


def test_overlay_blend_and_blender_transl():
    v, f = _uv_sphere(n=12)
    img = np.zeros((96, 96, 3), np.float32)
    out = render_mesh_overlay(img, v - v.mean(0), f,
                              transl=np.array([0.0, 0.0, 8.0]),
                              focal_length=500.0)
    assert out.shape == img.shape
    assert out.max() > 0  # something was drawn

    tr = weak_persp_to_blender(np.array([1.1]), np.array([[0.0, 0.0]]),
                               np.array([200.0]), focal_length=5000.0)
    assert tr.shape == (1, 3)
    np.testing.assert_allclose(tr[0, 2], 2 * 5000.0 / (1.1 * 200.0),
                               rtol=1e-4)

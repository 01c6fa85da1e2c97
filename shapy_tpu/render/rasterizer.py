"""Software mesh rasterizer for overlay rendering (host-side numpy).

Replaces the reference's pyrender/EGL renderers
(``regressor/human_shape/utils/plot_utils.py:237-849``: OverlayRenderer /
HDRenderer / GTRenderer) with a dependency-free z-buffered Lambertian
rasterizer. Rendering is off the hot path in the reference too (the demo
renders on the CPU after the model forward); parity target is "a correct
overlay image", not pixel-identical pyrender output.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

DEFAULT_FOCAL_LENGTH = 5000.0


def weak_persp_to_blender(
    scale: np.ndarray,
    translation: np.ndarray,
    bbox_size: np.ndarray,
    focal_length: float = DEFAULT_FOCAL_LENGTH,
):
    """Weak-perspective (scale, transl) -> perspective camera translation.

    Matches reference ``weak_persp_to_blender`` (regressor/demo.py:70-106):
    z = 2 * focal / (scale * bbox_size).
    """
    scale = np.asarray(scale).reshape(-1)
    translation = np.asarray(translation).reshape(-1, 2)
    bbox_size = np.asarray(bbox_size).reshape(-1)
    z = 2.0 * focal_length / (scale * bbox_size + 1e-9)
    transl = np.concatenate([translation, z[:, None]], axis=1)
    return transl


# Pyrender-like rig: an ambient floor plus three directional lights
# (key / fill / back), matching the HDRenderer's look (plot_utils.py:616+)
# closely enough for overlay-quality parity.
_LIGHT_RIG = (
    ((0.4, 0.3, -0.8), 0.55),
    ((-0.5, 0.2, -0.6), 0.25),
    ((0.0, -0.6, -0.4), 0.20),
)
_AMBIENT = 0.30


def _vertex_normals(v: np.ndarray, f: np.ndarray) -> np.ndarray:
    """Area-weighted per-vertex normals."""
    tri = v[f]
    fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    vn = np.zeros_like(v)
    for k in range(3):
        np.add.at(vn, f[:, k], fn)
    vn /= np.maximum(np.linalg.norm(vn, axis=1, keepdims=True), 1e-12)
    return vn


def _shade_normals(n: np.ndarray) -> np.ndarray:
    """Ambient + multi-directional Lambertian shading of unit normals."""
    s = np.full(n.shape[:-1], _AMBIENT)
    for direction, intensity in _LIGHT_RIG:
        d = np.asarray(direction, np.float64)
        d /= np.linalg.norm(d)
        s = s + intensity * np.clip(-(n @ d), 0.0, 1.0)
    return np.clip(s, 0.0, 1.0)


def rasterize_mesh(
    vertices: np.ndarray,
    faces: np.ndarray,
    image_size: Tuple[int, int],
    focal_length: float = DEFAULT_FOCAL_LENGTH,
    camera_center: Optional[np.ndarray] = None,
    light_dir: Tuple[float, float, float] = (0.3, 0.3, -1.0),
    shading_mode: str = "smooth",
    return_depth: bool = False,
) -> Tuple[np.ndarray, ...]:
    """Perspective-project and z-buffer rasterise one mesh.

    vertices: (V, 3) in camera coordinates (+z away from camera);
    returns (shading (H, W) float, mask (H, W) bool), plus the raw
    z-buffer (H, W; +inf outside the mask) when ``return_depth``.
    shading_mode: 'smooth' interpolates per-vertex normals
    (Gouraud, pyrender-overlay look); 'flat' shades per face.
    """
    H, W = image_size
    if camera_center is None:
        camera_center = np.asarray([W / 2.0, H / 2.0])
    v = np.asarray(vertices, np.float64)
    f = np.asarray(faces, np.int64)

    z = np.maximum(v[:, 2], 1e-6)
    px = focal_length * v[:, 0] / z + camera_center[0]
    py = focal_length * v[:, 1] / z + camera_center[1]
    pts = np.stack([px, py], axis=1)

    smooth = shading_mode == "smooth"
    if smooth:
        vert_shade = _shade_normals(_vertex_normals(v, f))
        tri_shade = vert_shade[f]  # (F, 3)
        shade = tri_shade.mean(axis=1)  # fallback for degenerate tris
    else:
        tri = v[f]
        n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
        light = np.asarray(light_dir, np.float64)
        light /= np.linalg.norm(light)
        shade = np.clip(-n @ light, 0.15, 1.0)
        tri_shade = None

    depth = np.full((H, W), np.inf)
    color = np.zeros((H, W))
    tri2d = pts[f]  # (F, 3, 2)
    tz = z[f].mean(axis=1)

    # Painter-ish loop over faces with barycentric inside-tests per bbox.
    order = np.argsort(-tz)  # far to near; z-buffer still decides
    for fi in order:
        p = tri2d[fi]
        xmin = max(int(np.floor(p[:, 0].min())), 0)
        xmax = min(int(np.ceil(p[:, 0].max())) + 1, W)
        ymin = max(int(np.floor(p[:, 1].min())), 0)
        ymax = min(int(np.ceil(p[:, 1].max())) + 1, H)
        if xmin >= xmax or ymin >= ymax:
            continue
        gx, gy = np.meshgrid(np.arange(xmin, xmax), np.arange(ymin, ymax))
        d = (p[1, 1] - p[2, 1]) * (p[0, 0] - p[2, 0]) + \
            (p[2, 0] - p[1, 0]) * (p[0, 1] - p[2, 1])
        if abs(d) < 1e-12:
            continue
        w0 = ((p[1, 1] - p[2, 1]) * (gx - p[2, 0])
              + (p[2, 0] - p[1, 0]) * (gy - p[2, 1])) / d
        w1 = ((p[2, 1] - p[0, 1]) * (gx - p[2, 0])
              + (p[0, 0] - p[2, 0]) * (gy - p[2, 1])) / d
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        zface = w0 * z[f[fi, 0]] + w1 * z[f[fi, 1]] + w2 * z[f[fi, 2]]
        sub_depth = depth[ymin:ymax, xmin:xmax]
        closer = inside & (zface < sub_depth)
        sub_depth[closer] = zface[closer]
        color_sub = color[ymin:ymax, xmin:xmax]
        if smooth:
            pix_shade = (w0 * tri_shade[fi, 0] + w1 * tri_shade[fi, 1]
                         + w2 * tri_shade[fi, 2])
            color_sub[closer] = pix_shade[closer]
        else:
            color_sub[closer] = shade[fi]

    mask = np.isfinite(depth)
    if return_depth:
        return color, mask, depth
    return color, mask


def render_mesh_overlay(
    image: np.ndarray,
    vertices: np.ndarray,
    faces: np.ndarray,
    transl: Optional[np.ndarray] = None,
    focal_length: float = DEFAULT_FOCAL_LENGTH,
    camera_center: Optional[np.ndarray] = None,
    color: Tuple[float, float, float] = (0.65, 0.75, 0.95),
    alpha: float = 0.9,
    shading_mode: str = "smooth",
) -> np.ndarray:
    """Blend a shaded mesh over an RGB image (reference HDRenderer
    overlay, plot_utils.py:719-723: the camera's principal point is the
    SUBJECT's bbox center, not the image center — the weak-perspective
    translation only encodes the in-crop offset, so an off-center
    detection rendered about (W/2, H/2) would be visibly displaced).
    ``camera_center``: (cx, cy) in pixels; defaults to the image center.
    """
    img = np.asarray(image, np.float32)
    H, W = img.shape[:2]
    v = np.asarray(vertices, np.float64)
    if transl is not None:
        v = v + np.asarray(transl).reshape(1, 3)
    shading, mask = rasterize_mesh(
        v, faces, (H, W), focal_length,
        camera_center=(None if camera_center is None
                       else np.asarray(camera_center).reshape(2)),
        shading_mode=shading_mode)
    out = img.copy()
    tint = np.asarray(color, np.float32)[None, None] * shading[..., None]
    out[mask] = (1 - alpha) * out[mask] + alpha * tint[mask]
    return out

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


def test_front_lit_like_pyrender_raymond():
    """The raymond rig is mounted in the camera frame: camera-facing
    surfaces must be lit well above the ambient floor (a back-lit rig
    would leave the sphere's center at exactly _AMBIENT)."""
    from shapy_tpu.render.rasterizer import _AMBIENT

    v, f = _uv_sphere()
    for mode in ("smooth", "phong"):
        s, m = rasterize_mesh(v, f, (128, 128), 800.0, shading_mode=mode)
        cy, cx = np.argwhere(m).mean(0).astype(int)
        assert s[cy, cx] > _AMBIENT + 0.3, (mode, s[cy, cx])


def test_phong_specular_and_materials():
    """Phong mode: per-pixel normals + Blinn-Phong specular. A metallic
    material must show a colored highlight exceeding its diffuse
    ceiling; silhouette is identical to the other modes."""
    from shapy_tpu.render import Material, render_mesh

    v, f = _uv_sphere()
    _, m_ref = rasterize_mesh(v, f, (128, 128), 800.0, shading_mode="flat")
    s, m = rasterize_mesh(v, f, (128, 128), 800.0, shading_mode="phong")
    np.testing.assert_array_equal(m, m_ref)
    assert s[m].min() >= 0.0 and s[m].max() <= 1.0

    # metallic red: specular color == base color, strong lobe
    rgb, a, depth = render_mesh(
        v, f, (128, 128), 800.0,
        material=Material((0.8, 0.2, 0.2), metallic=0.9, roughness=0.25))
    hit = a > 0
    assert hit.any()
    base_red_ceiling = 0.8 * (1.0 - 0.9)  # diffuse-only max
    assert rgb[hit][:, 0].max() > base_red_ceiling + 0.1
    assert np.isfinite(depth[hit]).all() and np.isinf(depth[~hit]).all()


def test_render_mesh_supersampling_antialiases():
    """supersample=2 produces fractional-coverage silhouette pixels and
    strictly smaller edge contrast than the aliased render."""
    from shapy_tpu.render import render_mesh

    v, f = _uv_sphere()
    rgb1, a1, _ = render_mesh(v, f, (96, 96), 600.0, supersample=1)
    rgb2, a2, _ = render_mesh(v, f, (96, 96), 600.0, supersample=2)
    assert set(np.unique(a1)) <= {0.0, 1.0}
    frac = (a2 > 0) & (a2 < 1)
    assert frac.sum() > 20  # the silhouette ring
    # same overall coverage
    np.testing.assert_allclose(a1.sum(), a2.sum(), rtol=0.1)


def test_vectorized_matches_reference_loop_semantics():
    """The lexsort z-resolve keeps the NEAREST fragment: a small near
    triangle occludes a large far one."""
    v = np.array([
        # far big triangle (z=10)
        [-1.0, -1.0, 10.0], [1.0, -1.0, 10.0], [0.0, 1.5, 10.0],
        # near small triangle (z=5), centered
        [-0.2, -0.2, 5.0], [0.2, -0.2, 5.0], [0.0, 0.3, 5.0],
    ])
    f = np.array([[0, 1, 2], [3, 4, 5]])
    _, mask, depth = rasterize_mesh(v, f, (64, 64), 30.0,
                                    return_depth=True)
    center = depth[32, 32]
    assert abs(center - 5.0) < 0.2, center


def test_overlay_renderer_batch():
    """OverlayRenderer: weak-persp ortho camera, (B, 3[4], H, W) output,
    scale_first parity with the reference projection matrix."""
    from shapy_tpu.render import COLORS, OverlayRenderer

    v, f = _uv_sphere(n=12)
    v = v - v.mean(0)
    ov = OverlayRenderer(img_size=64)
    scale = np.array([1.4, 1.4])
    transl = np.array([[0.0, 0.0], [0.3, 0.0]])
    out = ov(np.stack([v, v]), f, camera_scale=scale,
             camera_translation=transl)
    assert out.shape == (2, 3, 64, 64)
    assert out.max() <= 1.0 and out.min() >= 0.0
    # the translated sample is shifted right
    col0 = out[0].sum((0, 1))
    col1 = out[1].sum((0, 1))
    c0 = (col0 * np.arange(64)).sum() / max(col0.sum(), 1e-9)
    c1 = (col1 * np.arange(64)).sum() / max(col1.sum(), 1e-9)
    assert c1 > c0 + 3

    # scale_first: s*x + t vs s*(x + t) — different shift for s != 1
    out_sf = ov(v[None], f, camera_scale=np.array([1.4]),
                camera_translation=np.array([[0.3, 0.0]]),
                scale_first=True)
    colsf = out_sf[0].sum((0, 1))
    csf = (colsf * np.arange(64)).sum() / max(colsf.sum(), 1e-9)
    assert abs((c1 - c0) - (csf - c0) * 1.4) < 2.5

    # alpha channel + background compositing
    bg = np.zeros((1, 3, 64, 64), np.float32)
    with_a = ov(v[None], f, camera_scale=np.array([1.4]),
                camera_translation=np.zeros((1, 2)), bg_imgs=bg,
                return_with_alpha=True)
    assert with_a.shape == (1, 4, 64, 64)
    assert COLORS["GT"][1] > COLORS["GT"][0]  # the reference GT green


def test_gt_and_hd_renderers():
    """GTRenderer (per-sample intrinsics) and HDRenderer (perspective +
    AA) produce composited overlays at the background resolution."""
    from shapy_tpu.render import GTRenderer, HDRenderer

    v, f = _uv_sphere(n=12)
    K = np.array([[[500.0, 0, 48], [0, 500.0, 40], [0, 0, 1]]])
    bg = np.full((1, 3, 80, 96), 0.25, np.float32)
    gt = GTRenderer()
    out = gt(v[None], f, intrinsics=K, bg_imgs=bg)
    assert out.shape == (1, 3, 80, 96)
    mesh_px = (np.abs(out[0] - 0.25) > 1e-3).any(0)
    assert mesh_px.any()
    # GT green body: more green than red in mesh pixels
    assert out[0, 1][mesh_px].mean() > out[0, 0][mesh_px].mean()

    hd = HDRenderer()
    outh = hd(v[None] - v.mean(0)[None, None], f,
              focal_length=np.array([500.0]),
              camera_translation=np.array([[0.0, 0.0, 8.0]]),
              camera_center=np.array([[48.0, 40.0]]), bg_imgs=bg)
    assert outh.shape == (1, 3, 80, 96)
    # AA: fractional blend ring exists (pixels strictly between bg and body)
    diff = np.abs(outh[0] - 0.25).max(0)
    assert ((diff > 0.01) & (diff < 0.2)).sum() > 10

    # Over an OPAQUE background the composited alpha is 1 everywhere —
    # fractional-coverage silhouette pixels must not leave a translucent
    # fringe (reference compositing has bg alpha 1, plot_utils.py:601-627)
    outh_a = hd(v[None] - v.mean(0)[None, None], f,
                focal_length=np.array([500.0]),
                camera_translation=np.array([[0.0, 0.0, 8.0]]),
                camera_center=np.array([[48.0, 40.0]]), bg_imgs=bg,
                return_with_alpha=True)
    assert outh_a.shape == (1, 4, 80, 96)
    np.testing.assert_allclose(outh_a[0, 3], 1.0, atol=1e-6)


def test_skeleton_drawing():
    """create_skel_img: left joints red / right blue, invalid edges
    skipped; keyp_target_to_image resolves names+connections from the
    registry format; bbox drawing (reference plot_utils.py:138-236)."""
    from shapy_tpu.render import (create_bbox_img, create_skel_img,
                                  keyp_target_to_image)
    from shapy_tpu.data.keypoints import (KEYPOINT_NAMES_DICT,
                                          connections_for_names,
                                          kp_connections)

    img = np.zeros((64, 64, 3), np.float32)
    names = ["pelvis", "left_hip", "right_hip", "left_knee"]
    conns = connections_for_names(names)
    assert (0, 1) in conns and (0, 2) in conns and (1, 3) in conns
    kp = np.array([[32, 10], [12, 40], [52, 40], [12, 60]], np.float64)

    out = create_skel_img(img, kp, conns, names=names)
    assert out.shape == img.shape
    # left leg region is red-dominant, right hip region blue-dominant
    left = out[35:45, 8:16]
    right = out[35:45, 48:56]
    assert left[..., 0].sum() > left[..., 2].sum()
    assert right[..., 2].sum() > right[..., 0].sum()

    # invalid joints suppress their edges
    out2 = create_skel_img(img, kp, conns, names=names,
                           valid=np.array([1, 1, 0, 1]))
    assert out2[35:45, 48:56].sum() == 0.0

    # registry-format wrapper: openpose25_v1 names/edges resolve
    kp25 = np.zeros((len(KEYPOINT_NAMES_DICT["openpose25_v1"]), 3),
                    np.float32)
    kp25[:, 0] = 32; kp25[:, 1] = 32; kp25[:, 2] = 1.0
    assert len(kp_connections("openpose25_v1")) > 10
    out3 = keyp_target_to_image(img, kp25, "openpose25_v1")
    assert out3.sum() > 0

    box = create_bbox_img(img, np.array([8, 8, 56, 56]),
                          color=(1.0, 1.0, 1.0))
    assert box[8, 8:56].sum() > 0 and box[32, 32].sum() == 0


def test_evaluator_keypoint_summaries():
    """The evaluator logs gt/est keypoint skeleton grids when it knows
    the model joint order (reference evaluation.py:345-395)."""
    from shapy_tpu.eval.evaluator import Evaluator

    logged = {}

    class Writer:
        def add_image(self, tag, img, step):
            logged[tag] = img

        def add_scalar(self, *a, **k):
            pass

    names = ["pelvis", "left_hip", "right_hip", "left_knee", "neck"]
    ev = Evaluator(summary_writer=Writer(), keypoint_names=names,
                   render_summaries=True)
    B, S, K = 2, 32, len(names)
    rng = np.random.default_rng(0)
    imgs = rng.uniform(size=(B, S, S, 3)).astype(np.float32)
    verts = rng.normal(size=(B, 12, 3)).astype(np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]])
    outputs = {"stage_00": {
        "vertices": verts, "faces": faces,
        "proj_joints": rng.uniform(-0.5, 0.5, (B, K, 2)),
    }}
    targets = {
        "target_keypoints2d": np.concatenate(
            [rng.uniform(-0.5, 0.5, (B, K, 2)), np.ones((B, K, 1))],
            axis=-1),
        "gt_vertices": verts + 0.01,
    }
    ev.create_image_summaries(imgs, outputs, tag="ds/Images", step=0,
                              last_stage="stage_00", targets=targets)
    assert "ds/Images" in logged
    assert "ds/Images/gt_keypoints" in logged
    assert "ds/Images/est_keypoints" in logged
    assert "ds/Images/gt_mesh" in logged  # GT-green mesh grid
    g = logged["ds/Images/gt_keypoints"]
    assert g.shape == (3, S, B * S) and g.max() > 0


def test_evaluator_degrees_viewpoints():
    """degrees config appends rotated no-background views to each
    summary row (reference evaluation.py:421-434, defaults.py:74)."""
    from shapy_tpu.eval.evaluator import Evaluator, build_evaluator

    logged = {}

    class Writer:
        def add_image(self, tag, img, step):
            logged[tag] = img

    rng = np.random.default_rng(1)
    B, S = 2, 32
    imgs = rng.uniform(size=(B, S, S, 3)).astype(np.float32)
    outputs = {"stage_00": {
        "vertices": rng.normal(size=(B, 12, 3)).astype(np.float32),
        "faces": np.array([[0, 1, 2], [3, 4, 5]]),
    }}
    ev = Evaluator(summary_writer=Writer(), degrees=(90, 180))
    ev.create_image_summaries(imgs, outputs, tag="t", step=0,
                              last_stage="stage_00")
    # each row: overlay + 2 rotated views -> width = 3 * B * S
    assert logged["t"].shape == (3, S, 3 * B * S)

    ev2 = build_evaluator({"degrees": [90]})
    assert ev2.degrees == (90,)
    assert build_evaluator({}).degrees == ()

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shapy_tpu.core.geometry import gather_triangles
from shapy_tpu.measure import BodyMeasurements, MeasurementAnchors, DENSITY
from shapy_tpu.models.body.assets import icosphere
from shapy_tpu.ops.convex_hull import (
    hull_perimeter_exact_np,
    hull_perimeter_support,
)
from shapy_tpu.ops.plane_slice import plane_slice_triangles


def ellipsoid_mesh(a=0.3, b=0.8, c=0.25, subdiv=3):
    v, f = icosphere(subdiv)
    return v * np.array([a, b, c]), f


def test_plane_slice_matches_bruteforce(rng):
    verts, faces = ellipsoid_mesh()
    tris = jnp.asarray(verts[faces], dtype=jnp.float32)[None]
    h = 0.3
    pts, valid = plane_slice_triangles(tris, jnp.asarray([h]))
    pts, valid = np.asarray(pts)[0], np.asarray(valid)[0]

    # Brute-force per-triangle check
    tri_np = verts[faces]
    for i, t in enumerate(tri_np):
        s = t[:, 1] - h
        ncross = sum(
            1 for (x, y) in [(0, 1), (1, 2), (2, 0)] if s[x] * s[y] < 0
        )
        assert valid[i] == (ncross == 2)
        if valid[i]:
            # Both points on the plane and on the triangle edges
            np.testing.assert_allclose(pts[i, :, 1], h, atol=1e-5)


def test_hull_support_matches_exact_circle(rng):
    theta = rng.uniform(0, 2 * np.pi, size=200)
    r = 0.5
    pts = np.stack([r * np.cos(theta), r * np.sin(theta)], axis=-1)
    mask = np.ones(200, dtype=bool)
    approx = float(
        hull_perimeter_support(
            jnp.asarray(pts, dtype=jnp.float32)[None],
            jnp.asarray(mask)[None],
        )[0]
    )
    exact = hull_perimeter_exact_np(pts)
    assert abs(approx - exact) < 2e-3  # hull of samples, not the circle


def test_hull_support_matches_exact_random_clouds(rng):
    for _ in range(5):
        pts = rng.normal(size=(300, 2)) * [0.4, 0.2]
        mask = rng.uniform(size=300) > 0.3
        approx = float(
            hull_perimeter_support(
                jnp.asarray(pts, dtype=jnp.float32)[None],
                jnp.asarray(mask)[None],
                num_directions=2048,
            )[0]
        )
        exact = hull_perimeter_exact_np(pts, mask)
        assert abs(approx - exact) / exact < 5e-4


def test_hull_support_masked_empty():
    pts = jnp.zeros((1, 10, 2))
    mask = jnp.zeros((1, 10), dtype=bool)
    assert float(hull_perimeter_support(pts, mask)[0]) == 0.0


@pytest.fixture(scope="module")
def body_like():
    verts, faces = ellipsoid_mesh(subdiv=3)
    anchors = MeasurementAnchors.synthetic(faces, verts)
    meas = BodyMeasurements(anchors=anchors)
    tris = jnp.asarray(verts[faces], dtype=jnp.float32)[None]
    return verts, faces, meas, tris


def test_mass_matches_analytic_volume(body_like):
    verts, faces, meas, tris = body_like
    a, b, c = 0.3, 0.8, 0.25
    vol_analytic = 4.0 / 3.0 * np.pi * a * b * c
    mass = float(meas.compute_mass(tris)[0])
    # icosphere subdiv=3 underestimates the smooth ellipsoid by ~1%
    assert mass == pytest.approx(vol_analytic * DENSITY, rel=0.02)


def test_height_spans_mesh(body_like):
    verts, faces, meas, tris = body_like
    h, pts = meas.compute_height(tris)
    span = verts[:, 1].max() - verts[:, 1].min()
    assert float(h[0]) == pytest.approx(span, rel=0.02)
    assert pts.shape == (2, 1, 3)


def test_periphery_matches_scipy_hull(body_like):
    verts, faces, meas, tris = body_like
    out = meas.forward(tris)["measurements"]
    for name in ("chest", "waist", "hips"):
        exact = meas.periphery_exact_np(np.asarray(tris), name)
        got = float(out[name]["tensor"][0])
        assert got == pytest.approx(float(exact[0]), rel=1e-3), name
        # Ellipse circumference sanity: slice of ellipsoid at height y has
        # semi-axes a*sqrt(1-(y/b)^2), c*sqrt(1-(y/b)^2).
        y = float(out[name]["plane_height"][0])
        s = np.sqrt(max(0.0, 1 - (y / 0.8) ** 2))
        ax, cz = 0.3 * s, 0.25 * s
        # Ramanujan approximation
        hpar = ((ax - cz) / (ax + cz)) ** 2
        ell = np.pi * (ax + cz) * (
            1 + 3 * hpar / (10 + np.sqrt(4 - 3 * hpar))
        )
        assert got == pytest.approx(ell, rel=0.05), name


def test_measurements_differentiable(body_like, smplx_data):
    verts, faces, meas, tris = body_like

    def loss(scale):
        t = tris * scale
        m = meas.forward(t)["measurements"]
        return (
            m["mass"]["tensor"][0]
            + m["height"]["tensor"][0]
            + m["chest"]["tensor"][0]
        )

    g = float(jax.grad(loss)(jnp.asarray(1.0)))
    assert np.isfinite(g) and g > 0


def test_measurements_batched_and_jitted(body_like):
    verts, faces, meas, tris = body_like
    batch = jnp.concatenate([tris, tris * 1.1], axis=0)

    @jax.jit
    def run(t):
        m = meas.forward(t)["measurements"]
        return m["chest"]["tensor"], m["mass"]["tensor"]

    chest, mass = run(batch)
    assert chest.shape == (2,)
    # Linear scaling of circumference, cubic of mass
    assert float(chest[1]) == pytest.approx(float(chest[0]) * 1.1, rel=1e-3)
    assert float(mass[1]) == pytest.approx(float(mass[0]) * 1.1**3, rel=1e-3)


def test_reference_anchor_yaml_loads():
    anchors = MeasurementAnchors.from_yaml(model_type="smplx")
    assert anchors.head_top.face_idx == 2581
    assert anchors.left_heel.face_idx == 15605
    assert anchors.chest.face_idx == 18402  # NippleRight
    assert anchors.waist.face_idx == 19229  # BellyButton
    assert anchors.hips.face_idx == 6194  # Crotch


def test_gather_triangles(smplx_data):
    v = jnp.asarray(smplx_data["v_template"], dtype=jnp.float32)[None]
    f = smplx_data["f"]
    tris = gather_triangles(v, f)
    assert tris.shape == (1, f.shape[0], 3, 3)


def test_soa_fast_path_matches_aos(body_like):
    """forward_from_vertices (SoA hot path) == forward (AoS reference
    path) on every measurement tensor."""
    verts, faces, meas, tris = body_like
    batch = jnp.concatenate([tris, tris * 1.07], axis=0)
    vertices = jnp.asarray(
        np.stack([verts, verts * 1.07]), dtype=jnp.float32
    )

    aos = meas.forward(batch)["measurements"]
    soa = jax.jit(
        lambda v: meas.forward_from_vertices(v, faces)["measurements"]
    )(vertices)

    for name in ("mass", "height", "chest", "waist", "hips"):
        np.testing.assert_allclose(
            np.asarray(soa[name]["tensor"]),
            np.asarray(aos[name]["tensor"]),
            rtol=1e-5,
            err_msg=name,
        )


def test_candidate_face_subsets_exact_inside_bound():
    """The static candidate-face pruning (interval bound over the beta
    ball) changes NOTHING: measurements with subsets equal the full-face
    pipeline bit-for-bit for bodies inside the bound, in both slice
    modes, while pruning a real fraction of the faces."""
    import jax.numpy as jnp

    from shapy_tpu.measure.measurements import (
        BodyMeasurements,
        MeasurementAnchors,
        candidate_faces,
    )
    from shapy_tpu.models.body import SMPLX, make_synthetic_model_data

    model = SMPLX(
        model_data=make_synthetic_model_data("smplx", subdivisions=3))
    anchors = MeasurementAnchors.synthetic(
        model.faces, np.asarray(model.params["v_template"]))
    subsets = candidate_faces(
        np.asarray(model.params["v_template"]),
        np.asarray(model.params["shapedirs"])[:, :, :model.num_betas],
        model.faces, anchors, beta_bound=8.0,
    )
    F = model.faces.shape[0]
    for name, idx in subsets.items():
        assert len(idx) < F, f"{name}: no pruning ({len(idx)} vs {F})"

    rng = np.random.default_rng(3)
    # include betas right at the edge of the prior (norm ~= 7.9)
    betas = rng.normal(size=(4, model.num_betas)).astype(np.float32)
    betas[2] = betas[2] / np.linalg.norm(betas[2]) * 7.9
    v = model(betas=jnp.asarray(betas))["v_shaped"]

    for mode in ("reference", "exact"):
        full = BodyMeasurements(anchors=anchors, slice_mode=mode)
        pruned = BodyMeasurements(anchors=anchors, slice_mode=mode,
                                  face_subsets=subsets)
        mf = full.forward_from_vertices(v, model.faces)["measurements"]
        mp = pruned.forward_from_vertices(v, model.faces)["measurements"]
        for key in ("mass", "height", "chest", "waist", "hips"):
            np.testing.assert_allclose(
                np.asarray(mf[key]["tensor"]),
                np.asarray(mp[key]["tensor"]),
                rtol=0, atol=1e-6,
                err_msg=f"{mode}/{key}",
            )

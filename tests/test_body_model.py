import numpy as np
import jax
import jax.numpy as jnp

from shapy_tpu.core.kinematics import batch_rigid_transform
from shapy_tpu.models.body import SMPL, SMPLX, lbs as jlbs
from tests.golden_numpy import np_lbs, np_rigid_transform, random_rotmats


def test_rigid_transform_matches_sequential(rng, smplx_data):
    parents = np.asarray(smplx_data["kintree_table"][0], dtype=np.int64)
    parents[0] = -1
    J = len(parents)
    rots = random_rotmats(rng, (2, J)).astype(np.float32)
    joints = rng.normal(size=(2, J, 3)).astype(np.float32) * 0.2

    pj, rel, _ = batch_rigid_transform(
        jnp.asarray(rots), jnp.asarray(joints), parents
    )
    pj_ref, rel_ref = np_rigid_transform(
        rots.astype(np.float64), joints.astype(np.float64), parents
    )
    np.testing.assert_allclose(np.asarray(pj), pj_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rel), rel_ref, atol=1e-4)


def test_lbs_matches_golden(rng, smpl_data):
    parents = np.asarray(smpl_data["kintree_table"][0], dtype=np.int64)
    parents[0] = -1
    J = len(parents)
    V = smpl_data["v_template"].shape[0]
    B, nb = 2, 10

    betas = rng.normal(size=(B, nb)).astype(np.float32)
    rots = random_rotmats(rng, (B, J)).astype(np.float32)
    shapedirs = smpl_data["shapedirs"][:, :, :nb]
    posedirs_flat = smpl_data["posedirs"].reshape(V * 3, -1).T

    out = jlbs(
        jnp.asarray(betas),
        jnp.asarray(rots),
        jnp.asarray(smpl_data["v_template"], dtype=jnp.float32),
        jnp.asarray(shapedirs, dtype=jnp.float32),
        jnp.asarray(posedirs_flat, dtype=jnp.float32),
        jnp.asarray(smpl_data["J_regressor"], dtype=jnp.float32),
        parents,
        jnp.asarray(smpl_data["weights"], dtype=jnp.float32),
    )
    ref = np_lbs(
        betas.astype(np.float64),
        rots.astype(np.float64),
        smpl_data["v_template"],
        shapedirs,
        posedirs_flat,
        smpl_data["J_regressor"],
        parents,
        smpl_data["weights"],
    )
    np.testing.assert_allclose(
        np.asarray(out["v_shaped"]), ref["v_shaped"], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["joints"]), ref["joints"], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["vertices"]), ref["vertices"], atol=1e-4
    )


def test_smpl_forward_shapes(smpl_data):
    model = SMPL(model_data=smpl_data)
    out = model(betas=jnp.zeros((3, 10)))
    assert out["vertices"].shape == (3, model.num_verts, 3)
    assert out["joints"].shape[0] == 3
    assert out["v_shaped"].shape == (3, model.num_verts, 3)
    # Zero betas, identity pose => vertices == template
    np.testing.assert_allclose(
        np.asarray(out["vertices"][0]),
        np.asarray(model.params["v_template"]),
        atol=1e-5,
    )


def test_smplx_forward_and_landmarks(smplx_data):
    model = SMPLX(model_data=smplx_data, use_face_contour=True)
    B = 2
    aa = np.zeros((B, 21, 3), dtype=np.float32)
    aa[:, 0, 1] = 0.3
    out = model(
        betas=jnp.ones((B, 10)) * 0.5,
        body_pose=jnp.asarray(aa),
        expression=jnp.ones((B, 10)) * 0.1,
        transl=jnp.asarray([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]]),
        return_full_pose=True,
    )
    assert out["full_pose"].shape == (B, 55, 3, 3)
    # joints = 55 skeletal + 51 static landmarks + 17 dynamic contour
    assert out["joints"].shape == (B, 55 + 51 + 17, 3)
    # v_shaped excludes expression: recompute manually
    v_shaped = np.asarray(model.params["v_template"]) + np.einsum(
        "bl,vkl->bvk",
        np.full((B, 10), 0.5, dtype=np.float32),
        np.asarray(model.params["shapedirs"]),
    )
    np.testing.assert_allclose(np.asarray(out["v_shaped"]), v_shaped,
                               atol=1e-5)


def test_smplx_forward_jits(smplx_data):
    model = SMPLX(model_data=smplx_data)

    @jax.jit
    def step(betas):
        return model(betas=betas)["vertices"]

    v1 = step(jnp.zeros((2, 10)))
    v2 = step(jnp.ones((2, 10)))
    assert v1.shape == v2.shape
    assert not np.allclose(np.asarray(v1), np.asarray(v2))


def test_forward_shape_matches_forward(smplx_data):
    model = SMPLX(model_data=smplx_data)
    betas = jnp.asarray(np.random.default_rng(7).normal(size=(2, 10)),
                        dtype=jnp.float32)
    vs = model.forward_shape(betas)["v_shaped"]
    out = model(betas=betas)
    np.testing.assert_allclose(np.asarray(vs), np.asarray(out["v_shaped"]),
                               atol=1e-6)


def test_hand_pca(smplx_data):
    model = SMPLX(model_data=smplx_data, num_hand_components=6,
                  flat_hand_mean=False)
    rots = model.hand_pca_to_rotmats(jnp.ones((2, 6)), "l")
    assert rots.shape == (2, 15, 3, 3)
    eye = np.einsum("bjik,bjlk->bjil", np.asarray(rots), np.asarray(rots))
    np.testing.assert_allclose(
        eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5
    )


def test_smpl_mixed_batch_broadcast(rng, smpl_data):
    """betas batch 1 with pose batch 4 broadcasts (the lbs signature's
    B = max(...) promise)."""
    model = SMPL(model_data=smpl_data)
    betas = jnp.zeros((1, 10), jnp.float32)
    pose = jnp.asarray(
        rng.normal(size=(4, model.num_joints * 3)).astype(np.float32)
        * 0.1
    )
    out = model(betas=betas, body_pose=pose[:, 3:],
                global_rot=pose[:, :3])
    assert out["vertices"].shape[0] == 4
    assert np.isfinite(np.asarray(out["vertices"])).all()
    # and the shape term is shared: all items share v_shaped
    vs = np.asarray(out["v_shaped"])
    np.testing.assert_allclose(vs[0], vs[-1], atol=1e-6)


def test_exact_count_synthetic_meshes():
    """exact_counts refinement hits the REAL template sizes (reference
    body_models.py: SMPL 6890/13776, SMPL-X 10475/20908) and the full
    measurement pipeline stays well-defined on the refined mesh."""
    from shapy_tpu.measure import BodyMeasurements, MeasurementAnchors
    from shapy_tpu.models.body import make_synthetic_model_data
    from shapy_tpu.models.body.assets import REAL_MESH_COUNTS

    for model_type, sub in (("smplx", 5), ("smpl", 4)):
        data = make_synthetic_model_data(model_type, subdivisions=sub,
                                         exact_counts=True)
        v, f = data["v_template"], data["f"]
        assert (v.shape[0], f.shape[0]) == REAL_MESH_COUNTS[model_type]
        assert f.min() >= 0 and f.max() < v.shape[0]
        # Winding stayed consistent through the edge splits: positive
        # enclosed volume, no inverted faces.
        vol = np.einsum("ij,ij->i", v[f[:, 0]],
                        np.cross(v[f[:, 1]], v[f[:, 2]])).sum() / 6
        assert vol > 0.2

    data = make_synthetic_model_data("smpl", subdivisions=4,
                                     exact_counts=True)
    v = jnp.asarray(data["v_template"])[None]
    faces = np.asarray(data["f"])
    anchors = MeasurementAnchors.synthetic(faces, np.asarray(v[0]))
    meas = BodyMeasurements(anchors=anchors)
    out = meas.forward_from_vertices(v, faces)["measurements"]
    for key in ("mass", "height", "chest", "waist", "hips"):
        value = float(out[key]["tensor"][0])
        assert np.isfinite(value) and value > 0

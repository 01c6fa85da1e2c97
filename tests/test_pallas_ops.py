"""Pallas kernel equivalence tests (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shapy_tpu.models.body import lbs as jnp_lbs
from shapy_tpu.ops.lbs_pallas import (
    lbs_fused_from_rotmats,
    pack_lbs_operands,
)
from tests.golden_numpy import random_rotmats


def test_fused_lbs_matches_jnp(rng, smplx_data):
    parents = np.asarray(smplx_data["kintree_table"][0], np.int64)
    parents[0] = -1
    J = len(parents)
    V = smplx_data["v_template"].shape[0]
    B, nb = 3, 10

    shapedirs = smplx_data["shapedirs"][:, :, :nb]
    posedirs_flat = smplx_data["posedirs"].reshape(V * 3, -1).T

    betas = jnp.asarray(rng.normal(size=(B, nb)), jnp.float32)
    rots = jnp.asarray(random_rotmats(rng, (B, J)), jnp.float32)

    ref = jnp_lbs(
        betas,
        rots,
        jnp.asarray(smplx_data["v_template"], jnp.float32),
        jnp.asarray(shapedirs, jnp.float32),
        jnp.asarray(posedirs_flat, jnp.float32),
        jnp.asarray(smplx_data["J_regressor"], jnp.float32),
        parents,
        jnp.asarray(smplx_data["weights"], jnp.float32),
    )

    packed = pack_lbs_operands(
        smplx_data["v_template"], shapedirs, posedirs_flat,
        smplx_data["weights"], tile=128,
    )
    packed_dev = {
        k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
        for k, v in packed.items()
    }
    out = lbs_fused_from_rotmats(
        betas, rots,
        jnp.asarray(smplx_data["J_regressor"], jnp.float32),
        packed_dev, parents, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out["v_shaped"]), np.asarray(ref["v_shaped"]),
        atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["joints"]), np.asarray(ref["joints"]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["vertices"]), np.asarray(ref["vertices"]),
        atol=5e-5,
    )


def test_fused_lbs_nondivisible_tile(rng, smplx_data):
    """V=642 is not a multiple of 128: padding path."""
    parents = np.asarray(smplx_data["kintree_table"][0], np.int64)
    parents[0] = -1
    V = smplx_data["v_template"].shape[0]
    assert V % 128 != 0
    packed = pack_lbs_operands(
        smplx_data["v_template"], smplx_data["shapedirs"][:, :, :5],
        smplx_data["posedirs"].reshape(V * 3, -1).T,
        smplx_data["weights"], tile=128,
    )
    assert packed["sd_x"].shape[0] % 128 == 0
    betas = jnp.zeros((1, 5))
    rots = jnp.broadcast_to(jnp.eye(3), (1, len(parents), 3, 3))
    out = lbs_fused_from_rotmats(
        betas, rots,
        jnp.asarray(smplx_data["J_regressor"], jnp.float32),
        {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
         for k, v in packed.items()},
        parents, interpret=True,
    )
    # identity pose, zero betas -> template
    np.testing.assert_allclose(
        np.asarray(out["vertices"][0]),
        np.asarray(smplx_data["v_template"]), atol=1e-5,
    )


def test_fused_measurements_matches_jnp(rng):
    """Fused plane-slice + hull + volume kernel vs the jnp measure path."""
    from shapy_tpu.measure import BodyMeasurements, MeasurementAnchors
    from shapy_tpu.models.body.assets import icosphere
    from shapy_tpu.ops.measure_pallas import fused_measurements
    from shapy_tpu.core.geometry import signed_volume

    verts, faces = icosphere(3)
    verts = verts * np.asarray([0.3, 0.8, 0.25])
    B = 2
    tris = jnp.asarray(
        np.stack([verts[faces], verts[faces] * 1.1]), jnp.float32
    )
    anchors = MeasurementAnchors.synthetic(faces, verts)
    meas = BodyMeasurements(anchors=anchors, num_hull_directions=256)
    ref = meas.forward(tris)["measurements"]

    heights = jnp.stack(
        [ref[k]["plane_height"] for k in ("chest", "waist", "hips")],
        axis=1,
    )
    circ, vol = fused_measurements(
        tris, heights, num_directions=256, tile=512, interpret=True
    )
    for i, k in enumerate(("chest", "waist", "hips")):
        np.testing.assert_allclose(
            np.asarray(circ[:, i]), np.asarray(ref[k]["tensor"]),
            rtol=1e-4,
        )
    np.testing.assert_allclose(
        np.asarray(vol), np.asarray(signed_volume(tris)), rtol=1e-5
    )


def test_fused_measurements_empty_plane(rng):
    from shapy_tpu.ops.measure_pallas import fused_measurements
    from shapy_tpu.models.body.assets import icosphere

    verts, faces = icosphere(2)
    tris = jnp.asarray(verts[faces], jnp.float32)[None]
    # h=0.1 (not 0.0: the icosphere has an exact vertex ring at y=0,
    # which the strict-sign slice treats as degenerate, same as the
    # plane-slice op)
    heights = jnp.asarray([[99.0, 0.1, -99.0]])  # miss, hit, miss
    circ, vol = fused_measurements(
        tris, heights, num_directions=128, tile=512, interpret=True
    )
    assert float(circ[0, 0]) == 0.0
    assert float(circ[0, 1]) > 0.0
    assert float(circ[0, 2]) == 0.0

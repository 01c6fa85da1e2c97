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

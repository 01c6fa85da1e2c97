import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from shapy_tpu.core import rotations as R
from tests.golden_numpy import np_rodrigues, np_rot6d


def test_aa_to_rotmat_matches_scipy(rng):
    aa = rng.normal(size=(32, 3)).astype(np.float32)
    ours = np.asarray(R.aa_to_rotmat(jnp.asarray(aa)))
    ref = Rotation.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_aa_to_rotmat_matches_reference_formula(rng):
    aa = rng.normal(size=(8, 3)).astype(np.float64)
    ours = np.asarray(R.aa_to_rotmat(jnp.asarray(aa, dtype=jnp.float32)))
    ref = np_rodrigues(aa)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_aa_rotmat_roundtrip(rng):
    aa = rng.normal(size=(16, 3)).astype(np.float32) * 0.8
    back = np.asarray(R.rotmat_to_aa(R.aa_to_rotmat(jnp.asarray(aa))))
    np.testing.assert_allclose(back, aa, atol=1e-3)


def test_rot6d_decode_matches_golden(rng):
    x = rng.normal(size=(24, 6)).astype(np.float64)
    ours = np.asarray(R.rot6d_to_rotmat(jnp.asarray(x, dtype=jnp.float32)))
    ref = np_rot6d(x)
    np.testing.assert_allclose(ours, ref, atol=2e-5)
    # Valid rotations
    eye = np.einsum("bij,bkj->bik", ours, ours)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-5)
    assert np.all(np.linalg.det(ours) > 0.99)


def test_rot6d_identity_mean():
    m = np.asarray(R.rot6d_to_rotmat(R.IDENTITY_ROT6D[None]))
    np.testing.assert_allclose(m[0], np.eye(3), atol=1e-6)


def test_rot6d_roundtrip(rng):
    mats = Rotation.random(10, random_state=3).as_matrix().astype(np.float32)
    six = R.rotmat_to_rot6d(jnp.asarray(mats))
    back = np.asarray(R.rot6d_to_rotmat(six))
    np.testing.assert_allclose(back, mats, atol=1e-5)


def test_svd_projection(rng):
    noisy = Rotation.random(6, random_state=5).as_matrix() + \
        rng.normal(size=(6, 3, 3)) * 0.05
    proj = np.asarray(R.svd_project_rotation(
        jnp.asarray(noisy, dtype=jnp.float32)))
    eye = np.einsum("bij,bkj->bik", proj, proj)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-4)
    assert np.all(np.linalg.det(proj) > 0.9)


def test_euler_y():
    for ang in [-0.5, 0.0, 0.4, 1.2]:
        m = Rotation.from_euler("y", ang).as_matrix()[None]
        got = float(R.rotmat_to_euler_y(jnp.asarray(m, dtype=jnp.float32))[0])
        assert got == pytest.approx(ang, abs=1e-5)

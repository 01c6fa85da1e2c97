"""Rotation representations and conversions (pure JAX, fully jittable).

Conventions match the reference implementation so that imported checkpoints
decode identically (see reference
``regressor/human_shape/utils/rotation_utils.py:5-97`` and
``regressor/human_shape/models/common/pose_utils.py:76-155``):

  * axis-angle -> rotation matrix uses the Rodrigues formula with the
    reference's ``norm(aa + eps)`` angle regularisation,
  * the Zhou-6D continuous representation is stored **column-major**: a 6-vec
    reshaped to (3, 2) holds the first two *columns* of the rotation matrix,
    and decoding Gram-Schmidts column 0, orthogonalises column 1, and takes
    the cross product for column 2.

All functions operate on arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def aa_to_rotmat(aa: Array, eps: float = 1e-8) -> Array:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3) via Rodrigues.

    Mirrors reference ``batch_rodrigues`` (rotation_utils.py:5-37), including
    the ``norm(aa + eps)`` trick that keeps the gradient finite at zero.
    """
    batch_shape = aa.shape[:-1]
    aa = aa.reshape(-1, 3)
    angle = jnp.linalg.norm(aa + eps, axis=-1, keepdims=True)
    axis = aa / angle
    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]
    rx, ry, rz = axis[:, 0], axis[:, 1], axis[:, 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=-1
    ).reshape(-1, 3, 3)
    ident = jnp.eye(3, dtype=aa.dtype)
    rot = ident + sin * K + (1.0 - cos) * (K @ K)
    return rot.reshape(*batch_shape, 3, 3)


def rotmat_to_aa(R: Array, eps: float = 1e-7) -> Array:
    """Rotation matrices (..., 3, 3) -> axis-angle (..., 3).

    Mirrors reference ``batch_rot2aa`` (rotation_utils.py:40-87): angle from
    the trace, axis from the skew-symmetric part, with the same
    small-angle/near-pi clamping.
    """
    batch_shape = R.shape[:-2]
    R = R.reshape(-1, 3, 3)
    cos = 0.5 * (jnp.trace(R, axis1=-2, axis2=-1) - 1.0)
    cos = jnp.clip(cos, -1.0 + eps, 1.0 - eps)
    theta = jnp.arccos(cos)
    m21 = R[:, 2, 1] - R[:, 1, 2]
    m02 = R[:, 0, 2] - R[:, 2, 0]
    m10 = R[:, 1, 0] - R[:, 0, 1]
    denom = jnp.sqrt(m21 * m21 + m02 * m02 + m10 * m10 + eps)
    small = jnp.abs(theta) < 1e-5
    axis = jnp.stack(
        [
            jnp.where(small, m21, m21 / denom),
            jnp.where(small, m02, m02 / denom),
            jnp.where(small, m10, m10 / denom),
        ],
        axis=-1,
    )
    return (theta[:, None] * axis).reshape(*batch_shape, 3)


def rot6d_to_rotmat(x: Array) -> Array:
    """Zhou-6D (..., 6) -> rotation matrices (..., 3, 3).

    Column-major layout: ``x.reshape(3, 2)[:, 0]`` is the (unnormalised)
    first column. Matches reference ``ContinuousRotReprDecoder.forward``
    (pose_utils.py:138-155).
    """
    batch_shape = x.shape[:-1]
    m = x.reshape(-1, 3, 2)
    a1 = m[:, :, 0]
    a2 = m[:, :, 1]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-12)
    dot = jnp.sum(b1 * a2, axis=-1, keepdims=True)
    u2 = a2 - dot * b1
    b2 = u2 / jnp.maximum(jnp.linalg.norm(u2, axis=-1, keepdims=True), 1e-12)
    b3 = jnp.cross(b1, b2)
    R = jnp.stack([b1, b2, b3], axis=-1)
    return R.reshape(*batch_shape, 3, 3)


def rotmat_to_rot6d(R: Array) -> Array:
    """Rotation matrices (..., 3, 3) -> column-major 6D (..., 6).

    Inverse of :func:`rot6d_to_rotmat`'s layout; matches reference
    ``ContinuousRotReprDecoder.encode`` (pose_utils.py:128-135), which takes
    ``R[:, :3, :2]`` and flattens row-major.
    """
    batch_shape = R.shape[:-2]
    return R[..., :, :2].reshape(*batch_shape, 6)


IDENTITY_ROT6D = jnp.asarray([1.0, 0.0, 0.0, 1.0, 0.0, 0.0])


def rotmat_to_euler_y(R: Array) -> Array:
    """Y-rotation Euler angle used for the dynamic face contour lookup.

    Matches reference ``rot_mat_to_euler`` (rotation_utils.py:90-97):
    ``atan2(-R[2,0], sqrt(R[0,0]^2 + R[1,0]^2))``.
    """
    sy = jnp.sqrt(R[..., 0, 0] * R[..., 0, 0] + R[..., 1, 0] * R[..., 1, 0])
    return jnp.arctan2(-R[..., 2, 0], sy)


def svd_project_rotation(M: Array) -> Array:
    """Project arbitrary (..., 3, 3) matrices onto SO(3) via SVD.

    TPU note: 3x3 SVD is tiny scalar work; this decoder exists for parity
    with the reference's ``rot_mats`` parameterisation
    (pose_utils.py ``SVDRotationProjection``) and is off the default path
    (default is 6D). Runs fine under jit via ``jnp.linalg.svd``.
    """
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    fix = jnp.concatenate(
        [
            jnp.ones(M.shape[:-2] + (2,), M.dtype),
            det[..., None].astype(M.dtype),
        ],
        axis=-1,
    )
    return (U * fix[..., None, :]) @ Vt


def quat_to_rotmat(q: Array) -> Array:
    """Unit-normalised quaternion (..., 4) [w, x, y, z] -> (..., 3, 3)."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack(
                [
                    1 - 2 * (y * y + z * z),
                    2 * (x * y - w * z),
                    2 * (x * z + w * y),
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    2 * (x * y + w * z),
                    1 - 2 * (x * x + z * z),
                    2 * (y * z - w * x),
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    2 * (x * z - w * y),
                    2 * (y * z + w * x),
                    1 - 2 * (x * x + y * y),
                ],
                axis=-1,
            ),
        ],
        axis=-2,
    )

"""Pose / blend-shape parameter spaces and decoders.

Behavioural spec: reference ``regressor/human_shape/models/common/
pose_utils.py:21-477``. A parameter space describes one regressed group
(its flat dimension, mean vector, and the decoder mapping the raw network
output to rotation matrices / coefficients). Decoders are pure functions,
so the whole head stays jittable.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from shapy_tpu.core.rotations import (
    aa_to_rotmat,
    rot6d_to_rotmat,
    svd_project_rotation,
)

Array = jax.Array

IDENTITY_6D = np.asarray([1.0, 0.0, 0.0, 1.0, 0.0, 0.0], np.float32)


@dataclass(frozen=True)
class PoseSpace:
    """One pose group: raw dim, mean, and decoder to (B, J, 3, 3)."""

    num_angles: int
    param_type: str
    dim: int
    mean: np.ndarray
    decoder: Callable[[Array], Array]

    def encode_rotmats(self, rotmats: Array) -> Array:
        """(B, J, 3, 3) -> raw params, for targets/means."""
        if self.param_type == "cont_rot_repr":
            B = rotmats.shape[0]
            return rotmats[..., :, :2].reshape(B, -1)
        raise NotImplementedError(self.param_type)


@dataclass(frozen=True)
class BlendShapeSpace:
    dim: int
    mean: np.ndarray


def _tile_mean(mean, num_angles: int, per_joint: int,
               default: np.ndarray) -> np.ndarray:
    """Broadcast / trim a provided mean to ``num_angles`` joints
    (pose_utils.py:88-107)."""
    if mean is None:
        m = np.tile(default, num_angles)
        return m.astype(np.float32)
    m = np.asarray(mean, np.float32).reshape(-1, per_joint)
    if m.shape[0] < num_angles:
        reps = num_angles // m.shape[0] + 1
        m = np.tile(m, (reps, 1))
    return m[:num_angles].reshape(-1)


def build_pose_parameterization(
    num_angles: int,
    param_type: str = "cont_rot_repr",
    mean=None,
    pca_basis: Optional[np.ndarray] = None,
    num_pca_comps: int = 12,
    flat_hand_mean: bool = False,
    **kwargs,
) -> PoseSpace:
    """Factory mirroring reference ``build_pose_parameterization``."""
    if isinstance(mean, dict):
        mean = mean.get(param_type, mean.get("cont_rot_repr"))

    if param_type == "aa":
        mean_vec = _tile_mean(mean, num_angles, 3, np.zeros(3, np.float32))

        def decoder(x: Array) -> Array:
            return aa_to_rotmat(x.reshape(x.shape[0], num_angles, 3))

        return PoseSpace(num_angles, param_type, num_angles * 3, mean_vec,
                         decoder)

    if param_type == "cont_rot_repr":
        mean_vec = _tile_mean(mean, num_angles, 6, IDENTITY_6D)

        def decoder(x: Array) -> Array:
            return rot6d_to_rotmat(x.reshape(x.shape[0], num_angles, 6))

        return PoseSpace(num_angles, param_type, num_angles * 6, mean_vec,
                         decoder)

    if param_type == "pca":
        assert pca_basis is not None, "PCA pose space needs a basis"
        basis = np.asarray(pca_basis, np.float32)[:num_pca_comps]
        mean_aa = np.zeros(num_angles * 3, np.float32)
        if mean is not None and not flat_hand_mean:
            mean_aa = np.asarray(mean, np.float32).reshape(-1)
        basis_j = jnp.asarray(basis)
        mean_j = jnp.asarray(mean_aa)

        def decoder(x: Array) -> Array:
            aa = x @ basis_j + mean_j
            return aa_to_rotmat(aa.reshape(x.shape[0], num_angles, 3))

        return PoseSpace(num_angles, param_type, num_pca_comps,
                         np.zeros(num_pca_comps, np.float32), decoder)

    if param_type == "rot_mats":
        mean_vec = np.tile(np.eye(3, dtype=np.float32).reshape(-1),
                           num_angles)

        def decoder(x: Array) -> Array:
            return svd_project_rotation(
                x.reshape(x.shape[0], num_angles, 3, 3)
            )

        return PoseSpace(num_angles, param_type, num_angles * 9, mean_vec,
                         decoder)

    raise ValueError(f"Unknown pose parameterization: {param_type}")


def global_rot_mean_flipped(space: PoseSpace) -> np.ndarray:
    """The 180-degree-about-x global-orientation mean
    (body_heads.py:104-112): aa -> [pi, 0, 0]; 6D -> second column y
    component = -1."""
    mean = np.array(space.mean, copy=True)
    if space.param_type == "aa":
        mean[0] = np.pi
    elif space.param_type == "cont_rot_repr":
        mean[3] = -1.0
    return mean

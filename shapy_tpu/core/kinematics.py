"""Forward kinematics over a joint tree (pure JAX).

TPU-first design: instead of the reference's sequential per-joint Python loop
(``batch_rigid_transform`` in regressor/human_shape/models/body_models/lbs.py,
55 dependent 4x4 matmuls), joints are scheduled by **tree depth**. All joints
at the same depth compose with their parents in one batched einsum, so the
SMPL-X tree (depth ~8) costs ~8 batched 4x4 matmuls instead of 55 sequential
ones — and the schedule is static, so XLA sees a short, fully unrolled chain
of gathers + matmuls it can fuse.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def compute_level_schedule(parents: Sequence[int]) -> List[np.ndarray]:
    """Group joint indices by depth in the kinematic tree.

    ``parents[0]`` is the root (its parent entry is ignored / may be -1).
    Returns a list of int32 index arrays; level 0 is ``[0]``.
    """
    parents = np.asarray(parents)
    num_joints = len(parents)
    depth = np.zeros(num_joints, dtype=np.int64)
    for j in range(1, num_joints):
        depth[j] = depth[parents[j]] + 1
    levels = []
    for d in range(int(depth.max()) + 1):
        levels.append(np.nonzero(depth == d)[0].astype(np.int32))
    return levels


def local_transforms(rot_mats: Array, rel_joints: Array) -> Array:
    """Pack per-joint rotation + translation into homogeneous 4x4 matrices.

    rot_mats: (..., J, 3, 3); rel_joints: (..., J, 3) -> (..., J, 4, 4).
    """
    batch_shape = rot_mats.shape[:-2]
    top = jnp.concatenate([rot_mats, rel_joints[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=rot_mats.dtype),
        batch_shape + (1, 4),
    )
    return jnp.concatenate([top, bottom], axis=-2)


def batch_rigid_transform(
    rot_mats: Array,
    joints: Array,
    parents: Sequence[int],
    levels: Sequence[np.ndarray] | None = None,
) -> Tuple[Array, Array, Array]:
    """Compose per-joint rotations down the kinematic chain.

    Semantics match reference ``batch_rigid_transform`` (lbs.py:242-295):

    Args:
      rot_mats: (B, J, 3, 3) local joint rotations.
      joints:   (B, J, 3) rest-pose joint locations.
      parents:  static parent indices (len J, parents[0] arbitrary).
      levels:   optional precomputed :func:`compute_level_schedule` output.

    Returns:
      posed_joints   (B, J, 3): world joint positions,
      rel_transforms (B, J, 4, 4): skinning transforms (world transform with
        the rest-joint offset removed),
      transforms     (B, J, 4, 4): absolute world transforms.
    """
    parents_np = np.asarray(parents)
    if levels is None:
        levels = compute_level_schedule(parents_np)

    rel_joints = joints - jnp.where(
        (jnp.arange(joints.shape[-2]) == 0)[:, None],
        jnp.zeros_like(joints),
        joints[..., parents_np, :],
    )
    A = local_transforms(rot_mats, rel_joints)

    # Depth-scheduled composition: world[j] = world[parent[j]] @ A[j].
    world = A
    for level in levels[1:]:
        level = np.asarray(level)
        parent_idx = parents_np[level]
        composed = jnp.einsum(
            "...jab,...jbc->...jac", world[..., parent_idx, :, :], A[..., level, :, :]
        )
        world = world.at[..., level, :, :].set(composed)

    posed_joints = world[..., :3, 3]

    # Skinning transform: subtract the (rotated) rest joint so that a vertex
    # at the rest joint maps to the posed joint (lbs.py:287-293).
    rotated_rest = jnp.einsum("...jab,...jb->...ja", world[..., :3, :3], joints)
    rel_transforms = world.at[..., :3, 3].add(-rotated_rest)

    return posed_joints, rel_transforms, world

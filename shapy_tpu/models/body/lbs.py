"""Linear Blend Skinning (pure JAX, jittable, MXU-friendly).

Behavioural spec: reference ``regressor/human_shape/models/body_models/
lbs.py:99-239`` (blend shapes -> joint regression -> pose-corrective offsets
-> kinematic chain -> skinning). TPU-first differences:

  * the kinematic chain uses the depth-scheduled batched composition from
    :mod:`shapy_tpu.core.kinematics` instead of a sequential Python loop,
  * the three big contractions (blend shapes, pose offsets, skinning) are
    einsums over (B, V)-major layouts that XLA tiles onto the MXU,
  * everything is shape-static and differentiable end to end.

A fused Pallas LBS kernel was built, parity-tested, measured at the hot
shape (batch 128, V=10242, real v5e, chained-fori device timing) and
DELETED in round 4: 0.18 ms vs 0.17 ms for this jnp path (tied — XLA
fuses the contractions already) with no reverse-mode autodiff, while
fwd+bwd here is 0.39 ms. This module is the production path.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from shapy_tpu.core.geometry import blend_shapes, vertices2joints
from shapy_tpu.core.kinematics import batch_rigid_transform
from shapy_tpu.core.rotations import aa_to_rotmat

Array = jax.Array


def lbs(
    betas: Array,
    pose: Array,
    v_template: Array,
    shapedirs: Array,
    posedirs: Array,
    J_regressor: Array,
    parents: Sequence[int],
    lbs_weights: Array,
    pose2rot: bool = False,
    levels: Optional[Sequence[np.ndarray]] = None,
    v_shaped: Optional[Array] = None,
) -> Dict[str, Array]:
    """Linear blend skinning.

    Args:
      betas: (B, L) blend-shape coefficients (may include expression dims).
      pose: (B, J, 3, 3) rotation matrices, or (B, J*3) axis-angle when
        ``pose2rot`` is True.
      v_template: (V, 3) template vertices.
      shapedirs: (V, 3, L) shape blend-shape basis.
      posedirs: (9*(J-1), V*3) pose-corrective basis (already transposed to
        the reference's runtime layout, lbs.py:153-156 of the model loader).
      J_regressor: (J, V).
      parents: static kinematic tree.
      lbs_weights: (V, J) skinning weights.
      levels: optional precomputed depth schedule.
      v_shaped: optional precomputed (B, V, 3) shaped vertices; when given,
        the blend-shape term is skipped (used by ``forward_shape`` reuse).

    Returns dict with ``vertices`` (B, V, 3), ``joints`` (B, J, 3),
    ``v_shaped`` (B, V, 3), ``rel_transforms`` (B, J, 4, 4).
    """
    B = max(betas.shape[0], pose.shape[0])

    if v_shaped is None:
        v_shaped = v_template[None] + blend_shapes(betas, shapedirs)
    if v_shaped.shape[0] != B:
        # betas batch 1 with pose batch B (or vice versa): broadcast the
        # shape-derived tensors so the mixed-batch call the signature
        # implies actually works.
        v_shaped = jnp.broadcast_to(v_shaped,
                                    (B,) + v_shaped.shape[1:])

    joints = vertices2joints(J_regressor, v_shaped)

    if pose2rot:
        rot_mats = aa_to_rotmat(pose.reshape(pose.shape[0], -1, 3))
    else:
        rot_mats = pose.reshape(pose.shape[0], -1, 3, 3)
    if rot_mats.shape[0] != B:
        rot_mats = jnp.broadcast_to(rot_mats, (B,) + rot_mats.shape[1:])

    ident = jnp.eye(3, dtype=rot_mats.dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)
    pose_offsets = (pose_feature @ posedirs).reshape(B, -1, 3)
    v_posed = v_shaped + pose_offsets

    posed_joints, rel_transforms, _ = batch_rigid_transform(
        rot_mats, joints, parents, levels=levels
    )

    # Skinning: per-vertex transform is a convex combination of joint
    # transforms. Computed as a (V, J) x (B, J, 16) contraction -> MXU.
    T = jnp.einsum("vj,bjmn->bvmn", lbs_weights, rel_transforms)
    v_hom = jnp.concatenate([v_posed, jnp.ones_like(v_posed[..., :1])], axis=-1)
    verts = jnp.einsum("bvmn,bvn->bvm", T[..., :3, :], v_hom)

    return {
        "vertices": verts,
        "joints": posed_joints,
        "v_shaped": v_shaped,
        "rel_transforms": rel_transforms,
    }

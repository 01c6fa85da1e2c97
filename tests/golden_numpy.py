"""Independent numpy implementations of the published SMPL/LBS equations.

Deliberately written as naive sequential loops (per-joint chain walk,
per-vertex skinning) so they share no structure with the vectorised JAX
implementations they validate.
"""

import numpy as np
from scipy.spatial.transform import Rotation


def np_rodrigues(aa, eps=1e-8):
    aa = np.asarray(aa, dtype=np.float64)
    out = np.zeros(aa.shape[:-1] + (3, 3))
    flat = aa.reshape(-1, 3)
    res = []
    for v in flat:
        angle = np.linalg.norm(v + eps)
        axis = v / angle
        K = np.array(
            [
                [0, -axis[2], axis[1]],
                [axis[2], 0, -axis[0]],
                [-axis[1], axis[0], 0],
            ]
        )
        res.append(np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K)
    return np.asarray(res).reshape(out.shape)


def np_rigid_transform(rot_mats, joints, parents):
    """Sequential chain composition, one joint at a time."""
    B, J = rot_mats.shape[:2]
    world = np.zeros((B, J, 4, 4))
    rel = joints.copy()
    rel[:, 1:] -= joints[:, parents[1:]]
    for b in range(B):
        for j in range(J):
            A = np.eye(4)
            A[:3, :3] = rot_mats[b, j]
            A[:3, 3] = rel[b, j]
            if j == 0:
                world[b, j] = A
            else:
                world[b, j] = world[b, parents[j]] @ A
    posed_joints = world[:, :, :3, 3].copy()
    rel_tf = world.copy()
    for b in range(B):
        for j in range(J):
            rel_tf[b, j, :3, 3] -= world[b, j, :3, :3] @ joints[b, j]
    return posed_joints, rel_tf


def np_lbs(betas, rot_mats, v_template, shapedirs, posedirs_flat,
           J_regressor, parents, weights):
    """posedirs_flat: (9*(J-1), V*3) runtime layout."""
    B = betas.shape[0]
    V = v_template.shape[0]
    v_shaped = v_template[None] + np.einsum("bl,vkl->bvk", betas, shapedirs)
    joints = np.einsum("jv,bvk->bjk", J_regressor, v_shaped)
    pose_feat = (rot_mats[:, 1:] - np.eye(3)).reshape(B, -1)
    pose_off = (pose_feat @ posedirs_flat).reshape(B, V, 3)
    v_posed = v_shaped + pose_off
    posed_joints, rel_tf = np_rigid_transform(rot_mats, joints, parents)
    verts = np.zeros((B, V, 3))
    for b in range(B):
        for v in range(V):
            T = np.zeros((4, 4))
            for j in range(rel_tf.shape[1]):
                T += weights[v, j] * rel_tf[b, j]
            ph = np.append(v_posed[b, v], 1.0)
            verts[b, v] = (T @ ph)[:3]
    return {
        "vertices": verts,
        "joints": posed_joints,
        "v_shaped": v_shaped,
    }


def np_rot6d(x):
    """Column-major Zhou-6D decode, one sample at a time."""
    m = np.asarray(x, dtype=np.float64).reshape(-1, 3, 2)
    out = []
    for s in m:
        a1, a2 = s[:, 0], s[:, 1]
        b1 = a1 / np.linalg.norm(a1)
        u2 = a2 - (b1 @ a2) * b1
        b2 = u2 / np.linalg.norm(u2)
        b3 = np.cross(b1, b2)
        out.append(np.stack([b1, b2, b3], axis=1))
    return np.asarray(out).reshape(x.shape[:-1] + (3, 3))


def random_rotmats(rng, shape):
    n = int(np.prod(shape))
    return Rotation.random(n, random_state=np.random.RandomState(
        rng.integers(0, 2**31))).as_matrix().reshape(shape + (3, 3))

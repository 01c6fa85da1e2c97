"""Fused LBS Pallas kernel (the BASELINE north-star fusion).

The per-vertex work of LBS is three big contractions plus elementwise
glue (reference lbs.py:99-196; our jnp path in models/body/lbs.py):

  1. shape blend:   v_shaped = v_template + shapedirs @ betas
  2. pose blend:    v_posed  = v_shaped + pose_feature @ posedirs
  3. skinning:      T = lbs_weights @ A;  verts = T . [v_posed; 1]

Under plain XLA each step writes a (B, V, 3) intermediate to HBM. This
kernel tiles the vertex dimension and keeps a tile's entire pipeline in
VMEM, writing only the final vertices (+ v_shaped, which measurements
consume).

Layout note: Mosaic cannot lay out vectors with a trailing dim of 3, so
all operands are **coordinate-planar**: separate (V, .) matrices per
x/y/z coordinate, giving pure 2D (sublane x lane) tiles. Every matmul is
(TILE, K) @ (K, B) on the MXU; the skinning transform becomes 12 such
matmuls (rows 0..2 x cols 0..3 of the 4x4) followed by elementwise
combination. The tiny kinematic chain (55 joints of 4x4 matmuls) stays
in XLA where it belongs.

``pack_lbs_operands`` precomputes the planar layouts once at model load.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _lbs_kernel(
    betas_ref,      # (L, B)
    pose_feat_ref,  # (P, B)
    A_ref,          # (12*J, B) rows (4r+c)*J:(4r+c+1)*J = component (r, c)
    vt_ref,         # (TILE, 3)  -> but stored as (TILE, 8) padded? no: (TILE, 3) invalid; use 3 separate
    sd_x_ref, sd_y_ref, sd_z_ref,    # (TILE, L)
    pd_x_ref, pd_y_ref, pd_z_ref,    # (TILE, P)
    w_ref,          # (TILE, J)
    out_x_ref, out_y_ref, out_z_ref,     # (TILE, B)
    vsh_x_ref, vsh_y_ref, vsh_z_ref,     # (TILE, B)
):
    J = w_ref.shape[1]
    betas = betas_ref[:]
    pose_feat = pose_feat_ref[:]
    w = w_ref[:]

    # 1-2. Shape + pose blend shapes per coordinate plane.
    def shaped(sd_ref, col):
        v = sd_ref[:] @ betas + vt_ref[:, col][:, None]
        return v

    vsh_x = shaped(sd_x_ref, 0)
    vsh_y = shaped(sd_y_ref, 1)
    vsh_z = shaped(sd_z_ref, 2)
    vp_x = vsh_x + pd_x_ref[:] @ pose_feat
    vp_y = vsh_y + pd_y_ref[:] @ pose_feat
    vp_z = vsh_z + pd_z_ref[:] @ pose_feat

    # 3. Per-vertex skinning transform components T[r, c] = w @ A[r, c].
    def T(r, c):
        comp = 4 * r + c
        return jnp.dot(
            w, A_ref[comp * J:(comp + 1) * J, :],
            preferred_element_type=jnp.float32,
        )

    for r, out_ref in ((0, out_x_ref), (1, out_y_ref), (2, out_z_ref)):
        out_ref[:] = (
            T(r, 0) * vp_x + T(r, 1) * vp_y + T(r, 2) * vp_z + T(r, 3)
        )
    vsh_x_ref[:] = vsh_x
    vsh_y_ref[:] = vsh_y
    vsh_z_ref[:] = vsh_z


def pack_lbs_operands(
    v_template: np.ndarray,
    shapedirs: np.ndarray,
    posedirs_flat: np.ndarray,
    lbs_weights: np.ndarray,
    tile: int = 512,
) -> Dict[str, np.ndarray]:
    """Coordinate-planar layouts, vertex axis padded to a tile multiple.

    posedirs_flat is the runtime (P, V*3) layout; it is split into three
    (V, P) planes here.
    """
    V = v_template.shape[0]
    Vp = ((V + tile - 1) // tile) * tile
    pad = Vp - V

    vt = np.pad(np.asarray(v_template, np.float32), ((0, pad), (0, 0)))
    sd = np.pad(np.asarray(shapedirs, np.float32),
                ((0, pad), (0, 0), (0, 0)))
    w = np.pad(np.asarray(lbs_weights, np.float32), ((0, pad), (0, 0)))
    pd = np.asarray(posedirs_flat, np.float32)  # (P, V*3)
    P = pd.shape[0]
    pd_v3 = pd.T.reshape(V, 3, P)
    pd_v3 = np.pad(pd_v3, ((0, pad), (0, 0), (0, 0)))

    return {
        "vt_p": vt,                                # (Vp, 3)
        "sd_x": sd[:, 0, :], "sd_y": sd[:, 1, :], "sd_z": sd[:, 2, :],
        "pd_x": pd_v3[:, 0, :], "pd_y": pd_v3[:, 1, :],
        "pd_z": pd_v3[:, 2, :],
        "weights_p": w,
        "num_verts": V,
        "tile": tile,
    }


@functools.partial(
    jax.jit, static_argnames=("num_verts", "tile", "interpret")
)
def lbs_fused(
    betas: Array,
    pose_feature: Array,
    rel_transforms: Array,
    vt_p: Array,
    sd_x: Array, sd_y: Array, sd_z: Array,
    pd_x: Array, pd_y: Array, pd_z: Array,
    weights_p: Array,
    num_verts: int,
    tile: int = 512,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Fused skinning. Returns (vertices (B, V, 3), v_shaped (B, V, 3))."""
    from jax.experimental import pallas as pl

    B, L = betas.shape
    J = rel_transforms.shape[1]
    P = pose_feature.shape[1]
    Vp = sd_x.shape[0]
    grid = (Vp // tile,)

    betas_t = betas.T  # (L, B)
    pose_t = pose_feature.T  # (P, B)
    # A components: (B, J, 4, 4) -> (12*J, B); component (r, c) block.
    A = rel_transforms[:, :, :3, :]  # (B, J, 3, 4)
    A_rows = jnp.transpose(A, (2, 3, 1, 0)).reshape(12 * J, B)

    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))  # noqa: E731
    tiled = lambda w_: pl.BlockSpec((tile, w_), lambda i: (i, 0))  # noqa

    outs = pl.pallas_call(
        _lbs_kernel,
        grid=grid,
        in_specs=[
            full((L, B)),
            full((P, B)),
            full((12 * J, B)),
            tiled(3),
            tiled(L), tiled(L), tiled(L),
            tiled(P), tiled(P), tiled(P),
            tiled(J),
        ],
        out_specs=tuple(tiled(B) for _ in range(6)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((Vp, B), jnp.float32) for _ in range(6)
        ),
        interpret=interpret,
    )(betas_t, pose_t, A_rows, vt_p, sd_x, sd_y, sd_z, pd_x, pd_y, pd_z,
      weights_p)
    out_x, out_y, out_z, vsh_x, vsh_y, vsh_z = outs
    verts = jnp.stack([out_x, out_y, out_z], axis=-1)  # (Vp, B, 3)
    v_shaped = jnp.stack([vsh_x, vsh_y, vsh_z], axis=-1)
    verts = jnp.transpose(verts, (1, 0, 2))[:, :num_verts]
    v_shaped = jnp.transpose(v_shaped, (1, 0, 2))[:, :num_verts]
    return verts, v_shaped


def lbs_fused_from_rotmats(
    betas: Array,
    rot_mats: Array,
    joints_regressor: Array,
    packed: Dict,
    parents,
    levels=None,
    interpret: bool = False,
) -> Dict[str, Array]:
    """Kinematic chain in XLA + fused per-vertex kernel."""
    from shapy_tpu.core.kinematics import batch_rigid_transform

    B = betas.shape[0]
    V = packed["num_verts"]

    # Joint regression needs v_shaped at the J joints only: contract the
    # regressor into the template/shapedirs FIRST ((J,V)@(V,L) once per
    # call, constant-foldable under jit) instead of materialising the
    # full (B, V, 3) v_shaped in XLA — that would redo the exact HBM
    # intermediate the fused kernel exists to avoid, ~V/J (~190x) more
    # work for this step.
    jr = joints_regressor.astype(betas.dtype)  # (J, V)
    joints = jnp.stack(
        [
            (jr @ packed["vt_p"][:V, c])[None]
            + betas @ (jr @ packed[k][:V]).T
            for c, k in ((0, "sd_x"), (1, "sd_y"), (2, "sd_z"))
        ],
        axis=-1,
    )  # (B, J, 3)

    ident = jnp.eye(3, dtype=rot_mats.dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)
    posed_joints, rel_transforms, _ = batch_rigid_transform(
        rot_mats, joints, parents, levels=levels
    )
    verts, v_shaped_out = lbs_fused(
        betas,
        pose_feature,
        rel_transforms,
        packed["vt_p"],
        packed["sd_x"], packed["sd_y"], packed["sd_z"],
        packed["pd_x"], packed["pd_y"], packed["pd_z"],
        packed["weights_p"],
        num_verts=V,
        tile=packed["tile"],
        interpret=interpret,
    )
    return {
        "vertices": verts,
        "joints": posed_joints,
        "v_shaped": v_shaped_out,
        "rel_transforms": rel_transforms,
    }

"""SMPL / SMPL-H / SMPL-X body models (JAX pytrees + jittable forward).

Behavioural spec: reference ``regressor/human_shape/models/body_models/
body_models.py:66-767``. Differences are architectural, not semantic:

  * model parameters live in a plain dict-of-arrays pytree (``self.params``)
    so the forward pass is a pure function of ``(params, inputs)`` — it jits,
    vmaps, shards, and differentiates without module machinery;
  * static metadata (faces, parents, depth schedule, index maps) is kept as
    numpy on the host so nothing shape-dynamic leaks into traced code;
  * the full pose is assembled exactly in the reference's order
    (SMPL-X: global, body(21), jaw, leye, reye, lhand(15), rhand(15);
    body_models.py:706-711) so imported checkpoints pose identically.

Pose inputs are rotation matrices ``(B, n, 3, 3)`` (the regressor's native
format, ``pose2rot=False`` in the reference) or axis-angle ``(B, n, 3)``
detected by trailing shape.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from shapy_tpu.core.geometry import blend_shapes, vertices2landmarks
from shapy_tpu.core.kinematics import compute_level_schedule
from shapy_tpu.core.rotations import aa_to_rotmat, rotmat_to_euler_y
from shapy_tpu.models.body import assets
from shapy_tpu.models.body.lbs import lbs

Array = jax.Array


def find_joint_kin_chain(joint_id: int, parents: np.ndarray) -> list:
    chain = []
    curr = joint_id
    while curr != -1:
        chain.append(curr)
        curr = int(parents[curr])
    return chain


def _as_rotmats(pose: Optional[Array], batch: int, n: int, dtype) -> Array:
    """Default to identity; convert axis-angle (B, n, 3) to matrices."""
    if pose is None:
        return jnp.broadcast_to(jnp.eye(3, dtype=dtype), (batch, n, 3, 3))
    pose = jnp.asarray(pose, dtype=dtype)
    if pose.shape[-1] == 3 and pose.ndim >= 2 and pose.shape[-2] != 3:
        return aa_to_rotmat(pose.reshape(batch, n, 3))
    if pose.ndim == 2:  # flat axis-angle (B, n*3)
        return aa_to_rotmat(pose.reshape(batch, n, 3))
    return pose.reshape(batch, n, 3, 3)


def _batch_size(*arrays) -> int:
    # max() over leading dims, but safe under jax.export shape
    # polymorphism: comparing a symbolic batch dim against a literal is
    # inconclusive, so symbolic dims simply replace the literal-1 default
    # (broadcast-from-1 semantics are preserved for concrete shapes).
    b = 1
    for a in arrays:
        if a is None:
            continue
        d = a.shape[0]
        if isinstance(d, int):
            b = d if (isinstance(b, int) and d > b) else b
        elif isinstance(b, int):
            b = d
    return b


class SMPL:
    """SMPL body model: 23 body joints + root, linear shape space."""

    NAME = "smpl"
    NUM_BODY_JOINTS = 23
    SHAPE_SPACE_DIM = 300

    def __init__(
        self,
        model_data: Optional[Dict[str, np.ndarray]] = None,
        model_folder: str = "",
        gender: str = "neutral",
        num_betas: int = 10,
        dtype=jnp.float32,
        ext: str = "npz",
        v_template: Optional[np.ndarray] = None,
        extra_joint_faces: Optional[np.ndarray] = None,
        extra_joint_bcs: Optional[np.ndarray] = None,
        extra_joint_names: Optional[Sequence[str]] = None,
        j14_regressor: Optional[np.ndarray] = None,
        j14_source_idxs: Optional[np.ndarray] = None,
        j14_target_idxs: Optional[np.ndarray] = None,
        **kwargs,
    ):
        if model_data is None:
            model_data = assets.load_model_data(
                model_folder, self.NAME, gender=gender, ext=ext
            )
        self.gender = gender
        self.dtype = dtype
        self.num_betas = int(num_betas)

        self.faces = np.asarray(model_data["f"], dtype=np.int64)
        parents = np.asarray(model_data["kintree_table"][0], dtype=np.int64)
        parents[0] = -1
        self.parents = parents
        self.levels = compute_level_schedule(parents)

        if v_template is None:
            v_template = np.asarray(model_data["v_template"])
        shapedirs = np.asarray(model_data["shapedirs"])
        num_betas_avail = min(self.num_betas, shapedirs.shape[-1],
                              self.SHAPE_SPACE_DIM)
        # The stored basis defines the usable beta count; keeping the
        # larger requested value would make default betas (and any
        # regressor betas space built from num_betas) mismatch the
        # basis in blend_shapes (reference body_models.py clamps too).
        self.num_betas = num_betas_avail
        posedirs = np.asarray(model_data["posedirs"])
        # Runtime layout: (P, V*3) so pose offsets are one (B, P) x (P, V*3)
        # matmul (reference model loader, body_models.py:153-156).
        posedirs = posedirs.reshape(posedirs.shape[0] * 3, -1).T

        params: Dict[str, Array] = {
            "v_template": jnp.asarray(v_template, dtype=dtype),
            "shapedirs": jnp.asarray(
                shapedirs[:, :, :num_betas_avail], dtype=dtype
            ),
            "posedirs": jnp.asarray(posedirs, dtype=dtype),
            "J_regressor": jnp.asarray(model_data["J_regressor"], dtype=dtype),
            "lbs_weights": jnp.asarray(model_data["weights"], dtype=dtype),
        }

        # Optional extra joints regressed from mesh surface points
        # (reference JointsFromVerticesSelector, body_models/utils.py:43-102).
        self.extra_joint_names = list(extra_joint_names or [])
        if extra_joint_faces is not None:
            params["extra_joint_bcs"] = jnp.asarray(
                extra_joint_bcs, dtype=dtype
            )
            self.extra_joint_faces = np.asarray(extra_joint_faces, np.int64)
        else:
            self.extra_joint_faces = None

        # Optional J14/J9 regressor override (body_models.py:170-202,363-369).
        self.use_joint_regressor = j14_regressor is not None
        if self.use_joint_regressor:
            params["extra_joint_regressor"] = jnp.asarray(
                j14_regressor, dtype=dtype
            )
            self.j14_source_idxs = np.asarray(j14_source_idxs, np.int64)
            self.j14_target_idxs = np.asarray(j14_target_idxs, np.int64)

        self.params = params
        self._post_init(model_data)

    def _post_init(self, model_data: Dict[str, np.ndarray]) -> None:
        pass

    # -- static properties -------------------------------------------------
    @property
    def name(self) -> str:
        return self.NAME

    @property
    def num_verts(self) -> int:
        return self.params["v_template"].shape[0]

    @property
    def num_faces(self) -> int:
        return self.faces.shape[0]

    @property
    def num_joints(self) -> int:
        return self.params["J_regressor"].shape[0]

    @property
    def keypoint_names(self):
        from shapy_tpu.data.keypoints import model_keypoint_names

        # Honour this model's contour setting: SMPL-X defaults to
        # use_face_contour=False, and the joints array then has no
        # contour rows — a name list that still includes the 17 contour
        # names would mislabel every extra joint appended after them.
        names = model_keypoint_names(
            self.NAME,
            use_face_contour=getattr(self, "use_face_contour", True),
        )
        return names + self.extra_joint_names

    # -- forward -----------------------------------------------------------
    def forward_shape(
        self, betas: Optional[Array] = None, params: Optional[Dict] = None
    ) -> Dict[str, Array]:
        """betas -> shaped (T-pose) vertices (reference body_models.py:292-302)."""
        p = self.params if params is None else params
        if betas is None:
            betas = jnp.zeros((1, self.num_betas), dtype=self.dtype)
        v_shaped = p["v_template"][None] + blend_shapes(
            betas.astype(self.dtype), p["shapedirs"]
        )
        return {"vertices": v_shaped, "v_shaped": v_shaped, "betas": betas}

    def _pose_groups(self) -> Dict[str, int]:
        return {"global_rot": 1, "body_pose": self.NUM_BODY_JOINTS}

    def _assemble_pose(self, batch: int, kwargs: Dict[str, Any]) -> Array:
        parts = []
        for name, n in self._pose_groups().items():
            parts.append(_as_rotmats(kwargs.get(name), batch, n, self.dtype))
        return jnp.concatenate(parts, axis=1)

    def _shape_components(
        self, betas: Optional[Array], batch: int, kwargs: Dict[str, Any]
    ):
        if betas is None:
            betas = jnp.zeros((batch, self.num_betas), dtype=self.dtype)
        p = kwargs.get("params") or self.params
        return betas.astype(self.dtype), p["shapedirs"], betas

    def _extra_landmarks(self, batch, vertices, full_pose, params):
        return None, None

    def __call__(
        self,
        betas: Optional[Array] = None,
        transl: Optional[Array] = None,
        get_skin: bool = True,
        return_full_pose: bool = False,
        return_shaped: bool = True,
        params: Optional[Dict] = None,
        **kwargs,
    ) -> Dict[str, Array]:
        p = self.params if params is None else params
        pose_args = [kwargs.get(k) for k in self._pose_groups()]
        batch = _batch_size(betas, transl, *pose_args)

        shape_comps, shapedirs, betas = self._shape_components(
            betas, batch, dict(kwargs, params=params)
        )
        full_pose = self._assemble_pose(batch, kwargs)

        out = lbs(
            shape_comps,
            full_pose,
            p["v_template"],
            shapedirs,
            p["posedirs"],
            p["J_regressor"],
            self.parents,
            p["lbs_weights"],
            pose2rot=False,
            levels=self.levels,
        )
        vertices, joints = out["vertices"], out["joints"]

        landmarks, _ = self._extra_landmarks(batch, vertices, full_pose, p)
        joint_set = [joints]
        if landmarks is not None:
            joint_set.append(landmarks)
        if self.extra_joint_faces is not None:
            tri = vertices[:, self.faces[self.extra_joint_faces]]
            joint_set.append(
                jnp.sum(tri * p["extra_joint_bcs"][None, :, :, None], axis=-2)
            )
        joints = jnp.concatenate(joint_set, axis=1)

        if self.use_joint_regressor:
            reg_joints = jnp.einsum(
                "jv,bvk->bjk", p["extra_joint_regressor"], vertices
            )
            joints = joints.at[:, self.j14_source_idxs].set(
                reg_joints[:, self.j14_target_idxs]
            )

        if transl is not None:
            joints = joints + transl[:, None]
            vertices = vertices + transl[:, None]

        output: Dict[str, Any] = {"joints": joints, "faces": self.faces}
        if get_skin:
            output["vertices"] = vertices
        if return_full_pose:
            output["full_pose"] = full_pose
        if return_shaped:
            # SMPL-X reports v_shaped WITHOUT expression dims
            # (body_models.py:750-755); handled by _v_shaped_for_output.
            output["v_shaped"] = self._v_shaped_for_output(out, betas, p)
        return output

    def _v_shaped_for_output(self, lbs_out, betas, params) -> Array:
        return lbs_out["v_shaped"]


class SMPLH(SMPL):
    """SMPL+H: SMPL body with 2 x 15 articulated hand joints + PCA hands."""

    NAME = "smplh"
    NUM_BODY_JOINTS = 21
    NUM_HAND_JOINTS = 15

    def __init__(self, *args, num_hand_components: int = 45,
                 flat_hand_mean: bool = True, **kwargs):
        self.num_hand_components = num_hand_components
        self.flat_hand_mean = flat_hand_mean
        super().__init__(*args, **kwargs)

    def _post_init(self, model_data: Dict[str, np.ndarray]) -> None:
        super()._post_init(model_data)
        n = self.num_hand_components
        for side in ("l", "r"):
            comps = model_data.get(f"hands_components{side}")
            mean = model_data.get(f"hands_mean{side}")
            if comps is not None:
                self.params[f"hand_components_{side}"] = jnp.asarray(
                    comps[:n], dtype=self.dtype
                )
            if mean is not None:
                self.params[f"hand_mean_{side}"] = jnp.asarray(
                    mean, dtype=self.dtype
                )

    def _pose_groups(self) -> Dict[str, int]:
        return {
            "global_rot": 1,
            "body_pose": self.NUM_BODY_JOINTS,
            "left_hand_pose": self.NUM_HAND_JOINTS,
            "right_hand_pose": self.NUM_HAND_JOINTS,
        }

    def hand_pca_to_rotmats(self, coeffs: Array, side: str) -> Array:
        """PCA hand coefficients (B, n) -> (B, 15, 3, 3) rotations."""
        aa = coeffs @ self.params[f"hand_components_{side}"]
        if not self.flat_hand_mean:
            aa = aa + self.params[f"hand_mean_{side}"][None]
        return aa_to_rotmat(aa.reshape(coeffs.shape[0], 15, 3))


class SMPLX(SMPLH):
    """SMPL-X: SMPL-H + jaw/eyes, expression space, facial landmarks."""

    NAME = "smplx"
    NUM_FACE_JOINTS = 3
    EXPRESSION_SPACE_DIM = 100
    NECK_IDX = 12
    HEAD_IDX = 15

    def __init__(self, *args, num_expression_coeffs: int = 10,
                 use_face_contour: bool = False, **kwargs):
        self.num_expression_coeffs = int(num_expression_coeffs)
        self.use_face_contour = use_face_contour
        super().__init__(*args, **kwargs)

    def _post_init(self, model_data: Dict[str, np.ndarray]) -> None:
        super()._post_init(model_data)
        # Expression basis lives in shapedirs[:, :, 300:300+n]
        # (body_models.py:592-597).
        shapedirs = np.asarray(model_data["shapedirs"])
        start = self.SHAPE_SPACE_DIM
        if shapedirs.shape[-1] <= self.SHAPE_SPACE_DIM:
            # Synthetic / truncated assets: take trailing dims as expression.
            start = max(0, shapedirs.shape[-1] - self.EXPRESSION_SPACE_DIM)
        expr_dirs = shapedirs[:, :, start:start + self.num_expression_coeffs]
        self.params["expr_dirs"] = jnp.asarray(expr_dirs, dtype=self.dtype)

        self.params["lmk_faces_idx"] = jnp.asarray(
            model_data["lmk_faces_idx"], dtype=jnp.int32
        )
        self.params["lmk_bary_coords"] = jnp.asarray(
            model_data["lmk_bary_coords"], dtype=self.dtype
        )
        self.params["dynamic_lmk_faces_idx"] = jnp.asarray(
            model_data["dynamic_lmk_faces_idx"], dtype=jnp.int32
        )
        self.params["dynamic_lmk_bary_coords"] = jnp.asarray(
            model_data["dynamic_lmk_bary_coords"], dtype=self.dtype
        )
        self.neck_kin_chain = np.asarray(
            find_joint_kin_chain(
                min(self.HEAD_IDX, self.num_joints - 1), self.parents
            ),
            dtype=np.int64,
        )

    def _pose_groups(self) -> Dict[str, int]:
        return {
            "global_rot": 1,
            "body_pose": self.NUM_BODY_JOINTS,
            "jaw_pose": 1,
            "leye_pose": 1,
            "reye_pose": 1,
            "left_hand_pose": self.NUM_HAND_JOINTS,
            "right_hand_pose": self.NUM_HAND_JOINTS,
        }

    def _shape_components(self, betas, batch, kwargs):
        p = kwargs.get("params") or self.params
        if betas is None:
            betas = jnp.zeros((batch, self.num_betas), dtype=self.dtype)
        expression = kwargs.get("expression")
        if expression is None:
            expression = jnp.zeros(
                (batch, self.num_expression_coeffs), dtype=self.dtype
            )
        shape_comps = jnp.concatenate(
            [betas.astype(self.dtype), expression.astype(self.dtype)], axis=-1
        )
        shapedirs = jnp.concatenate([p["shapedirs"], p["expr_dirs"]], axis=-1)
        return shape_comps, shapedirs, betas

    def _dynamic_contour(self, full_pose: Array, params: Dict):
        """Neck-chain yaw -> contour landmark table row (lbs.py:20-49)."""
        rot_mats = full_pose[:, self.neck_kin_chain]  # (B, C, 3, 3)
        rel = jnp.eye(3, dtype=full_pose.dtype)
        for i in range(len(self.neck_kin_chain)):
            rel = rot_mats[:, i] @ rel
        y_deg = jnp.clip(
            jnp.round(-rotmat_to_euler_y(rel) * 180.0 / np.pi), max=39
        ).astype(jnp.int32)
        neg = y_deg < 0
        big_neg = y_deg < -39
        neg_vals = jnp.where(big_neg, 78, 39 - y_deg)
        row = jnp.where(neg, neg_vals, y_deg)
        return (
            params["dynamic_lmk_faces_idx"][row],
            params["dynamic_lmk_bary_coords"][row],
        )

    def _extra_landmarks(self, batch, vertices, full_pose, params):
        lmk_faces_idx = jnp.broadcast_to(
            params["lmk_faces_idx"], (batch,) + params["lmk_faces_idx"].shape
        )
        lmk_bary = jnp.broadcast_to(
            params["lmk_bary_coords"],
            (batch,) + params["lmk_bary_coords"].shape,
        )
        if self.use_face_contour:
            dyn_idx, dyn_bary = self._dynamic_contour(full_pose, params)
            lmk_faces_idx = jnp.concatenate([lmk_faces_idx, dyn_idx], axis=1)
            lmk_bary = jnp.concatenate([lmk_bary, dyn_bary], axis=1)
        landmarks = vertices2landmarks(
            vertices, jnp.asarray(self.faces, jnp.int32), lmk_faces_idx,
            lmk_bary,
        )
        return landmarks, None

    def _v_shaped_for_output(self, lbs_out, betas, params) -> Array:
        return params["v_template"][None] + blend_shapes(
            betas.astype(self.dtype), params["shapedirs"]
        )


MODEL_CLASSES = {"smpl": SMPL, "smplh": SMPLH, "smplx": SMPLX}


def build_body_model(model_type: str = "smplx", **kwargs):
    """Factory mirroring reference ``build_body_model``
    (models/body_models/build.py)."""
    return MODEL_CLASSES[model_type](**kwargs)

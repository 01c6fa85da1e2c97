"""The SHAPY body regressor: backbone + iterative head + body model +
measurements + attribute plugins, as one jittable pure function.

Behavioural spec: reference ``regressor/human_shape/models/common/
iterative_regressor.py:39-870`` (HMRLikeRegressor) and
``models/body_heads/body_heads.py:36-283`` (SMPL/SMPL-H/SMPL-X subclasses).

TPU-first design decisions:
  * all learnable state lives in one pytree ``self.params`` =
    {'backbone': ..., 'head': ..., 'param_mean': ...}; the forward pass is
    ``apply(params, images, batch)`` — jit/pjit/grad compose directly;
  * the reference's per-stage Python decode loop becomes a static unroll of
    ``num_stages`` (3) matmul stages — XLA fuses the whole head;
  * gender routing for the frozen B2A/A2B plugins
    (iterative_regressor.py:761-852) is branch-free: both gender models run
    (they are tiny polynomials) and a mask selects per-row — no
    data-dependent control flow under jit;
  * measurements ride the same XLA program (dense plane slice + support
    hull) instead of a custom-op + host round-trip.

Parameter layout (flat vector order) matches the reference exactly:
pose spaces in declaration order, then blend shapes, then camera
(iterative_regressor.py:78-104), so imported checkpoints decode stage
outputs identically. SHAPY demo config: global_rot(6) + body_pose(126) +
betas(10) + camera(3) = 145.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from shapy_tpu.models.backbones.hrnet import hrnet_forward, hrnet_init
from shapy_tpu.models.body.model import build_body_model
from shapy_tpu.models.cameras.projection import (
    PerspectiveCamera,
    build_cam_proj,
)
from shapy_tpu.models.heads.mlp import mlp_forward, mlp_init
from shapy_tpu.models.heads.pose_space import (
    BlendShapeSpace,
    PoseSpace,
    build_pose_parameterization,
    global_rot_mean_flipped,
)

Array = jax.Array


class BodyRegressor:
    """HMR-style iterative regressor over a configurable body model."""

    MODEL_TYPE = "smpl"

    def __init__(
        self,
        body_model_cfg: Optional[Dict] = None,
        network_cfg: Optional[Dict] = None,
        body_model=None,
        b2a_models: Optional[Dict[str, Any]] = None,
        a2b_models: Optional[Dict[str, Any]] = None,
        measurements=None,
        seed: int = 0,
        dtype=jnp.float32,
    ):
        body_model_cfg = dict(body_model_cfg or {})
        network_cfg = dict(network_cfg or {})
        self.network_cfg = network_cfg
        self.dtype = dtype

        self.pose_last_stage = bool(network_cfg.get("pose_last_stage", True))
        self.num_stages = int(network_cfg.get("num_stages", 3))
        self.predict_hands = bool(network_cfg.get("predict_hands", True))
        self.predict_face = bool(network_cfg.get("predict_face", True))

        # Body model
        if body_model is None:
            body_model = build_body_model(
                self.MODEL_TYPE,
                **dict(body_model_cfg.get(self.MODEL_TYPE) or {}),
                model_folder=body_model_cfg.get("model_folder", ""),
            )
        self.model = body_model
        self.curr_model_cfg = dict(body_model_cfg.get(self.MODEL_TYPE) or {})
        self.mean_poses_dict = self._load_mean_poses()

        # Camera
        cam_data = build_cam_proj(network_cfg.get("camera"))
        self.projection = cam_data["camera"]
        self.camera_scale_func = cam_data["scale_func"]

        # Parameter spaces, in the reference's order.
        spaces: Dict[str, Any] = {}
        spaces.update(self._build_pose_space())
        spaces.update(self._build_blendshape_space())
        spaces["camera"] = BlendShapeSpace(
            dim=cam_data["dim"], mean=np.asarray(cam_data["mean"])
        )
        self.spaces = spaces

        self.param_slices: Dict[str, slice] = {}
        start = 0
        means: List[np.ndarray] = []
        for name, desc in spaces.items():
            self.param_slices[name] = slice(start, start + desc.dim)
            means.append(np.asarray(desc.mean, np.float32).reshape(-1))
            start += desc.dim
        self.param_dim = start
        param_mean = np.concatenate(means)[None]

        # Backbone + head parameters
        backbone_cfg = dict(network_cfg.get("backbone") or {})
        self.backbone_type = backbone_cfg.get("type", "hrnet")
        if self.backbone_type == "hrnet":
            hrnet_cfg = dict(backbone_cfg.get("hrnet") or {})
            self.hrnet_old_impl = bool(
                hrnet_cfg.get("use_old_impl",
                              backbone_cfg.get("use_old_impl", False))
            )
            backbone_params = hrnet_init(seed=seed, dtype=dtype,
                                         old_impl=self.hrnet_old_impl)
            self.feat_dim = 2048
        else:
            from shapy_tpu.models.backbones.resnet import (
                resnet_init,
                RESNET_FEAT_DIM,
            )

            depth = int(backbone_cfg.get("depth", 50))
            backbone_params = resnet_init(depth, seed=seed, dtype=dtype)
            self.feat_dim = RESNET_FEAT_DIM[depth]
            self.resnet_depth = depth

        # Regressor head: iterative-mlp (default, the SHAPY config) or
        # iterative-rnn (reference build_regressor, networks.py:727-762).
        self.regressor_type = network_cfg.get("type", "iterative-mlp")
        if self.regressor_type in ("SMPLRegressor", "SMPLHRegressor",
                                   "SMPLXRegressor"):
            self.regressor_type = "iterative-mlp"
        mlp_cfg = dict(network_cfg.get("mlp") or {})
        self.mlp_layers = tuple(mlp_cfg.get("layers", (1024, 1024)))
        self.mlp_activation = (mlp_cfg.get("activation") or {}).get(
            "type", "none"
        )
        if self.mlp_activation in ("none", "None"):
            self.mlp_activation = None
        self.mlp_dropout = float(mlp_cfg.get("dropout", 0.0))
        if self.regressor_type == "iterative-rnn":
            from shapy_tpu.models.heads.networks_extra import (
                MultiLayerRNNCell,
            )

            rnn_cfg = dict(network_cfg.get("rnn") or {})
            self.rnn = MultiLayerRNNCell(
                self.feat_dim + self.param_dim,
                self.param_dim,
                tuple(rnn_cfg.get("hidden_dims", (1024, 1024))),
                seed=seed + 1,
            )
            head_params = self.rnn.params
        else:
            head_params = mlp_init(
                self.feat_dim + self.param_dim,
                self.param_dim,
                self.mlp_layers,
                gain=float(mlp_cfg.get("gain", 0.01)),
                seed=seed + 1,
                dtype=dtype,
            )

        self.params: Dict[str, Any] = {
            "backbone": backbone_params,
            "head": head_params,
            "param_mean": jnp.asarray(param_mean, dtype=dtype),
        }

        # Measurements (iterative_regressor.py:128-143)
        self.compute_measurements = bool(
            network_cfg.get("compute_measurements", False)
        ) or measurements is not None
        self.body_measurements = measurements
        if self.compute_measurements and measurements is None:
            from shapy_tpu.measure import BodyMeasurements

            self.body_measurements = BodyMeasurements(
                model_type=self.model.name,
                meas_definition_path=network_cfg.get("meas_definition_path"),
                meas_vertices_path=network_cfg.get("meas_vertices_path"),
            )

        # Frozen attribute plugins (iterative_regressor.py:146-204)
        self.b2a_models = b2a_models or {}
        self.a2b_models = a2b_models or {}
        self.num_attributes = int(network_cfg.get("num_attributes", 15))

    # -- space builders (overridden per model family) ----------------------
    def _load_mean_poses(self) -> Dict[str, np.ndarray]:
        import os
        import pickle

        path = os.path.expandvars(
            str(self.curr_model_cfg.get("mean_pose_path", ""))
        )
        if path and os.path.exists(path):
            with open(path, "rb") as f:
                return pickle.load(f, encoding="latin1")
        return {}

    def _build_pose_space(self) -> Dict[str, PoseSpace]:
        global_cfg = dict(self.curr_model_cfg.get("global_rot") or {})
        body_cfg = dict(self.curr_model_cfg.get("body_pose") or {})
        global_desc = build_pose_parameterization(1, **global_cfg)
        global_desc = PoseSpace(
            global_desc.num_angles,
            global_desc.param_type,
            global_desc.dim,
            global_rot_mean_flipped(global_desc),
            global_desc.decoder,
        )
        body_desc = build_pose_parameterization(
            self.model.NUM_BODY_JOINTS,
            mean=self.mean_poses_dict.get("body_pose"),
            **body_cfg,
        )
        return {"global_rot": global_desc, "body_pose": body_desc}

    def _build_blendshape_space(self) -> Dict[str, BlendShapeSpace]:
        num_betas = self.model.num_betas
        mean = np.zeros(num_betas, np.float32)
        import os

        path = os.path.expandvars(
            str(self.curr_model_cfg.get("shape_mean_path", ""))
        )
        if path and os.path.exists(path):
            mean = np.load(path, allow_pickle=True).reshape(-1)[
                :num_betas
            ].astype(np.float32)
        return {"betas": BlendShapeSpace(dim=num_betas, mean=mean)}

    # -- decode ------------------------------------------------------------
    def flat_params_to_dict(self, flat: Array) -> Dict[str, Array]:
        return {
            name: flat[:, sl] for name, sl in self.param_slices.items()
        }

    def decode_params(self, flat: Array) -> Dict[str, Array]:
        raw = self.flat_params_to_dict(flat)
        out: Dict[str, Array] = {}
        for name, val in raw.items():
            desc = self.spaces[name]
            if isinstance(desc, PoseSpace):
                out[name] = desc.decoder(val)
                out[f"raw_{name}"] = val
            else:
                out[name] = val
        return out

    # -- forward -----------------------------------------------------------
    def compute_features(self, params, images: Array, train: bool,
                         axis_name=None, backbone_store=None) -> Array:
        # MXU-first: optionally run the conv backbone in bfloat16 (weights
        # cast lazily inside conv/BN via x.dtype) and return f32 features
        # so the head/pose decode/LBS stay full precision.
        bdt = getattr(self, "backbone_compute_dtype", None)
        if bdt is not None:
            images = images.astype(bdt)
        if self.backbone_type == "hrnet":
            feats = hrnet_forward(
                params["backbone"], images, train=train,
                axis_name=axis_name,
                old_impl=getattr(self, "hrnet_old_impl", False),
                remat=getattr(self, "backbone_remat", "none"),
                _store=backbone_store,
            )["concat"]
        else:
            from shapy_tpu.models.backbones.resnet import resnet_forward

            feats = resnet_forward(
                params["backbone"], images, self.resnet_depth,
                train=train, axis_name=axis_name, _store=backbone_store,
            )["avg_pooling"]
        return feats.astype(self.dtype)

    def iterative_stages(self, params, features: Array, train: bool,
                         rng=None, cond: Optional[Array] = None
                         ) -> List[Array]:
        """HMR-style additive refinement (networks.py:536-592)."""
        B = features.shape[0]
        if cond is None:
            cond = jnp.broadcast_to(
                params["param_mean"].astype(features.dtype),
                (B, self.param_dim),
            )
        stages = []
        current = cond
        rnn_state = (
            self.rnn.init_state(B)
            if self.regressor_type == "iterative-rnn" else None
        )
        for i in range(self.num_stages):
            x = jnp.concatenate([features, current], axis=-1)
            if rng is not None:
                rng, sub = jax.random.split(rng)
            else:
                sub = None
            if rnn_state is not None:
                delta, rnn_state = self.rnn.apply(
                    params["head"], x, rnn_state
                )
            else:
                delta = mlp_forward(
                    params["head"], x, len(self.mlp_layers),
                    self.mlp_activation, self.mlp_dropout, train, sub,
                )
            current = current + delta
            stages.append(current)
        return stages

    def _model_forward_kwargs(self, decoded: Dict[str, Array]
                              ) -> Dict[str, Array]:
        return {k: v for k, v in decoded.items()
                if not k.startswith("raw_") and k != "camera"}

    def apply(
        self,
        params: Dict[str, Any],
        images: Array,
        batch: Optional[Dict[str, Array]] = None,
        train: bool = False,
        rng: Optional[Array] = None,
        axis_name: Optional[str] = None,
        backbone_store=None,
        model_params: Optional[Dict[str, Array]] = None,
    ) -> Dict[str, Any]:
        """images: (B, H, W, 3) normalised crops; batch: optional target
        dict with 'gender' (int8: 0 neutral / 1 male / 2 female),
        'attributes', 'height', 'weight' for the attribute plugins.
        ``backbone_store`` (a ParamStore) collects BN stat updates in
        train mode for the functional train step.

        ``model_params``: the body model's parameter pytree, passed as a
        jit ARGUMENT instead of closed over. Closure-captured jax arrays
        are embedded verbatim in the serialized HLO (measured: a 4 MB
        array adds 4 MB to the module proto) — the flagship's ~100 MB of
        SMPL-X blend shapes made every XLA compile slow and overflowed
        the dev tunnel's compile request at batch 256. Defaults to the
        closure (``self.model.params``) for convenience call sites."""
        B = images.shape[0]
        features = self.compute_features(
            params, images, train, axis_name, backbone_store
        )
        stage_params = self.iterative_stages(params, features, train, rng)

        param_dicts = [self.decode_params(p) for p in stage_params]

        # Note: only array-typed values go into the output dict so the whole
        # apply() is a valid jit return; static metadata (stage_keys,
        # num_stages) lives on the module object instead.
        out: Dict[str, Any] = {"features": features}

        if self.pose_last_stage:
            posed = [self.num_stages - 1]
        else:
            posed = list(range(self.num_stages))

        # Batch the posed stages through one body-model evaluation
        # (the reference's concat trick, iterative_regressor.py:664-677).
        merged = {}
        for key in self._model_forward_kwargs(param_dicts[0]):
            merged[key] = jnp.concatenate(
                [param_dicts[i][key] for i in posed], axis=0
            )
        model_output = self.model(
            get_skin=True, return_shaped=True, params=model_params,
            **merged
        )

        for si, i in enumerate(posed):
            stage_out = {
                k: v[si * B:(si + 1) * B]
                for k, v in model_output.items()
                if isinstance(v, jnp.ndarray) and v.ndim >= 1
                and v.shape[0] == B * len(posed)
            }
            stage_out["faces"] = self.model.faces
            stage_out.update(param_dicts[i])
            out[f"stage_{i:02d}"] = stage_out
        for i in range(self.num_stages):
            out.setdefault(f"stage_{i:02d}", param_dicts[i])

        last_key = f"stage_{self.num_stages - 1:02d}"
        last = out[last_key]

        # Camera projection (iterative_regressor.py:713-727). The decode
        # depends on the camera space: weak-persp regresses
        # [scale, tx, ty]; persp regresses [focal, tx, ty, tz] (both
        # first components through the positive-scale function).
        cam = param_dicts[-1]["camera"]
        if isinstance(self.projection, PerspectiveCamera):
            focal = self.camera_scale_func(cam[:, 0])
            translation = cam[:, 1:4]
            proj_joints = self.projection(
                last["joints"], focal_length=focal,
                translation=translation,
            )
            out["camera_parameters"] = {
                "focal_length": focal,
                "translation": translation,
            }
        else:
            scale = self.camera_scale_func(cam[:, 0:1])
            translation = cam[:, 1:3]
            proj_joints = self.projection(
                last["joints"], scale=scale, translation=translation
            )
            out["camera_parameters"] = {
                "scale": scale,
                "translation": translation,
                "scale_first": getattr(self.projection, "scale_first",
                                       False),
            }
        out["proj_joints"] = proj_joints
        last["proj_joints"] = proj_joints

        # Measurements on the shaped (T-pose) mesh
        # (iterative_regressor.py:742-756).
        measurements = None
        if self.compute_measurements:
            # SoA fast path: no (B, F, 3, 3) triangle materialisation,
            # full-lane-width slice+hull (see BodyMeasurements
            # .forward_from_vertices).
            # Candidate-face pruning only in eval: the static subsets
            # are exact only inside the beta bound they were built for,
            # and mid-training predictions can wander outside it (the
            # pruning's win is eval throughput; in training the
            # measurement cost hides under the conv schedule anyway).
            measurements = self.body_measurements.forward_from_vertices(
                last["v_shaped"], self.model.faces,
                use_face_subsets=not train,
            )["measurements"]
            meas_dict = {k: v["tensor"] for k, v in measurements.items()}
            out["measurements"] = meas_dict
            last["measurements"] = meas_dict

        # Frozen B2A plugin: betas -> attributes, gender-routed by mask
        # (iterative_regressor.py:761-776).
        if self.b2a_models and batch is not None and "gender" in batch:
            betas = param_dicts[-1]["betas"]
            gender = batch["gender"].reshape(-1)
            male = jnp.asarray(self.b2a_models["male"](betas))
            female = jnp.asarray(self.b2a_models["female"](betas))
            attributes = jnp.where(
                (gender == 1)[:, None], male,
                jnp.where((gender == 2)[:, None], female,
                          jnp.zeros_like(male)),
            )
            out["attributes"] = attributes

        # Frozen A2B plugin: target attributes (+height/weight +measured
        # height/mass) -> refined betas (iterative_regressor.py:778-852).
        if (self.a2b_models and batch is not None and "gender" in batch
                and measurements is not None):
            gender = batch["gender"].reshape(-1)
            attr = batch.get(
                "attributes", jnp.zeros((B, self.num_attributes))
            )
            # Population means fill missing values
            # (iterative_regressor.py:797-812).
            height_m = batch.get("height", jnp.full((B,), 1.71))
            height_f = batch.get("height", jnp.full((B,), 1.59))
            weight_m = batch.get("weight", jnp.full((B,), 71.0))
            weight_f = batch.get("weight", jnp.full((B,), 62.0))

            def feature_vec(model_a2b, height, weight):
                batch_np = {
                    "rating": attr,
                    "height_gt": height,
                    "weight_gt": weight,
                    "height_bg": measurements["height"]["tensor"],
                    "weight_bg": measurements["mass"]["tensor"],
                }
                return model_a2b.create_input_feature_vec_jax(batch_np)

            male_model = self.a2b_models["male"]
            female_model = self.a2b_models["female"]
            male_betas = male_model.a2b(
                jnp.asarray(feature_vec(male_model, height_m, weight_m),
                            self.dtype)
            )
            female_betas = female_model.a2b(
                jnp.asarray(feature_vec(female_model, height_f, weight_f),
                            self.dtype)
            )
            betas_ref = jnp.where(
                (gender == 1)[:, None], male_betas,
                jnp.where((gender == 2)[:, None], female_betas,
                          jnp.zeros_like(male_betas)),
            )
            v_shaped_ref = self.model.forward_shape(
                betas_ref, params=model_params)["v_shaped"]
            last["betas_ref"] = betas_ref
            last["v_shaped_ref"] = v_shaped_ref

        return out

    def apply_from_full_images(
        self,
        params: Dict[str, Any],
        full_images: Array,
        crop_to_image_affines: Array,
        crop_size: int = 256,
        mean: Optional[Array] = None,
        std: Optional[Array] = None,
        **kwargs,
    ) -> Dict[str, Any]:
        """Fused preprocessing + forward (the BASELINE "fuse
        crop+normalize into the model" item): full images (B, H, W, 3) in
        [0, 1] f32 — or raw uint8, decoded to [0, 1] on device so the
        host->device transfer is 4x smaller — + crop->image affines
        (B, 3, 3) are cropped with the on-device bilinear warp,
        ImageNet-normalised, and fed to the backbone — one jitted program
        from raw pixels to measurements, no host-side cv2 warp on the hot
        path."""
        from shapy_tpu.data.crop import jax_bilinear_crop
        from shapy_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

        if jnp.issubdtype(full_images.dtype, jnp.integer):
            full_images = full_images.astype(self.dtype) * (1.0 / 255.0)
        mean = jnp.asarray(
            IMAGENET_MEAN if mean is None else mean, full_images.dtype
        )
        std = jnp.asarray(
            IMAGENET_STD if std is None else std, full_images.dtype
        )
        crops = jax_bilinear_crop(
            full_images, crop_to_image_affines, (crop_size, crop_size)
        )
        crops = (crops - mean) / std
        return self.apply(params, crops, **kwargs)

    def __call__(self, images, batch=None, **kwargs):
        return self.apply(self.params, images, batch=batch, **kwargs)


class SMPLRegressor(BodyRegressor):
    MODEL_TYPE = "smpl"


class SMPLHRegressor(BodyRegressor):
    MODEL_TYPE = "smplh"

    def _build_pose_space(self):
        spaces = super()._build_pose_space()
        if self.predict_hands:
            for side, name in (("l", "left_hand_pose"),
                               ("r", "right_hand_pose")):
                cfg = dict(self.curr_model_cfg.get(name) or {})
                basis = self.model.params.get(f"hand_components_{side}")
                spaces[name] = build_pose_parameterization(
                    self.model.NUM_HAND_JOINTS,
                    mean=self.mean_poses_dict.get(name),
                    pca_basis=np.asarray(basis) if basis is not None
                    else None,
                    **cfg,
                )
        return spaces


class SMPLXRegressor(SMPLHRegressor):
    MODEL_TYPE = "smplx"

    def _build_pose_space(self):
        spaces = super()._build_pose_space()
        if self.predict_face:
            cfg = dict(self.curr_model_cfg.get("jaw_pose") or {})
            spaces["jaw_pose"] = build_pose_parameterization(
                1, mean=self.mean_poses_dict.get("jaw_pose"), **cfg
            )
        return spaces

    def _build_blendshape_space(self):
        spaces = super()._build_blendshape_space()
        if self.predict_face:
            n = self.model.num_expression_coeffs
            spaces["expression"] = BlendShapeSpace(
                dim=n, mean=np.zeros(n, np.float32)
            )
        return spaces


BODY_HEAD_REGISTRY = {
    "SMPLRegressor": SMPLRegressor,
    "SMPLHRegressor": SMPLHRegressor,
    "SMPLXRegressor": SMPLXRegressor,
}


def build_body_head(cfg: Dict, **kwargs) -> BodyRegressor:
    """Factory mirroring reference body_heads/build.py:5-32."""
    network_cfg = dict(cfg.get("network") or {})
    head_type = network_cfg.get("type", "SMPLXRegressor")
    if head_type not in BODY_HEAD_REGISTRY:
        raise ValueError(f"Unknown body head: {head_type}")
    sub_cfg_key = {
        "SMPLRegressor": "smpl",
        "SMPLHRegressor": "smplh",
        "SMPLXRegressor": "smplx",
    }[head_type]
    return BODY_HEAD_REGISTRY[head_type](
        body_model_cfg=dict(cfg.get("body_model") or {}),
        network_cfg=dict(network_cfg.get(sub_cfg_key) or {}),
        **kwargs,
    )

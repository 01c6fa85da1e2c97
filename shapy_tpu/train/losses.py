"""Training loss aggregation for the body regressor.

Behavioural spec: reference ``regressor/human_shape/models/common/
iterative_regressor.py:371-581`` (compute_losses), ``models/body_heads/
body_loss_modules.py`` (per-stage parameter losses + regularizers), and
``models/common/keypoint_loss.py:15-144`` (part keypoint losses centered
around configured root joints).

The SHAPY demo config's active terms (configs/b2a_expose_hrnet_demo.yaml
losses section): body_joints_2d (l1), body_joints_3d (l1), shape L2 +
gender-shape prior, global_rot/body_pose rotation losses, attributes
(1e1), measurement terms (weights 0 by default but supported).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from shapy_tpu.losses.losses import (
    keypoint_loss,
    l2_loss,
    rotation_loss,
    weighted_l1_loss,
)
from shapy_tpu.losses.priors import GenderShapePrior

Array = jax.Array


def center_keypoints(kp: Array, conf: Array, center_idxs: np.ndarray):
    """Center both pred and gt around the mean of the given joints when
    they are all valid (reference KeypointLosses centering,
    keypoint_loss.py:70-110). Returns centered keypoints."""
    idx = jnp.asarray(center_idxs)
    valid = jnp.all(conf[:, idx] > 0, axis=-1, keepdims=True)
    center = jnp.mean(kp[:, idx], axis=1, keepdims=True)
    return jnp.where(valid[..., None], kp - center, kp)


class RegressorLosses:
    """Configured loss aggregator; __call__ is traceable."""

    def __init__(
        self,
        loss_cfg: Optional[Dict] = None,
        regressor=None,
        gender_shape_prior: Optional[GenderShapePrior] = None,
    ):
        cfg = dict(loss_cfg or {})
        body = dict(cfg.get("body") or cfg)
        self.w_joints2d = float(
            (body.get("body_joints_2d") or {}).get("weight", 1.0)
        )
        self.w_joints3d = float(
            (body.get("body_joints_3d") or {}).get("weight", 1.0)
        )
        self.norm2d = (body.get("body_joints_2d") or {}).get(
            "norm_type", "l1"
        )
        shape_cfg = dict(body.get("shape") or {})
        self.w_shape = float(shape_cfg.get("weight", 1e-3))
        self.w_shape_prior = float(
            (shape_cfg.get("prior") or {}).get("weight", 0.0)
        )
        self.w_global_rot = float(
            (body.get("global_rot") or {}).get("weight", 1.0)
        )
        self.w_body_pose = float(
            (body.get("body_pose") or {}).get("weight", 1.0)
        )
        self.w_attributes = float(
            (body.get("attributes") or {}).get("weight", 0.0)
        )
        self.meas_weights = {
            k: float((body.get(k) or {}).get("weight", 0.0))
            for k in ("mass", "height", "chest", "waist", "hips")
        }
        self.w_identity = float(
            (body.get("identity") or {}).get("weight", 0.0)
        )
        self.w_beta_refined = float(
            (body.get("beta_refined") or {}).get("weight", 0.0)
        )
        self.w_vertex_refined = float(
            (body.get("vertex_refined") or {}).get("weight", 0.0)
        )
        self.gender_shape_prior = gender_shape_prior
        self.regressor = regressor
        # Stage selection (stages_to_penalize, default last stage)
        self.stages = list(body.get("stages_to_penalize", ["stage_02"]))

    def __call__(
        self,
        out: Dict[str, Any],
        batch: Dict[str, Array],
    ) -> Dict[str, Array]:
        """out: regressor.apply output; batch: target dict with optional
        'target_keypoints2d' (B, N, 3), 'joints3d' (B, N, 4),
        'gt_betas', 'gt_global_rot', 'gt_body_pose' (rotmats),
        'attributes', 'gender', measurement targets + '<name>_valid'
        masks."""
        losses: Dict[str, Array] = {}
        for stage_key in self.stages:
            stage = out.get(stage_key)
            if stage is None:
                continue
            suffix = "" if len(self.stages) == 1 else f"_{stage_key}"

            if self.w_joints2d > 0 and "target_keypoints2d" in batch:
                gt = batch["target_keypoints2d"]
                proj = out["proj_joints"]
                n = min(proj.shape[1], gt.shape[1])
                losses[f"joints2d{suffix}"] = (
                    self.w_joints2d
                    * keypoint_loss(
                        proj[:, :n], gt[:, :n, :2], gt[:, :n, 2],
                        self.norm2d,
                    )
                )

            if self.w_joints3d > 0 and "joints3d" in batch:
                gt = batch["joints3d"]
                est = stage["joints"]
                n = min(est.shape[1], gt.shape[1])
                losses[f"joints3d{suffix}"] = (
                    self.w_joints3d
                    * keypoint_loss(
                        est[:, :n], gt[:, :n, :3], gt[:, :n, 3], "l1"
                    )
                )

            if self.w_shape > 0 and "gt_betas" in batch:
                w = batch.get("gt_betas_valid")
                losses[f"shape{suffix}"] = self.w_shape * weighted_l1_loss(
                    stage["betas"], batch["gt_betas"], w
                )

            if self.w_global_rot > 0 and "gt_global_rot" in batch:
                losses[f"global_rot{suffix}"] = (
                    self.w_global_rot
                    * rotation_loss(stage["global_rot"],
                                    batch["gt_global_rot"],
                                    batch.get("gt_pose_valid"))
                )
            if self.w_body_pose > 0 and "gt_body_pose" in batch:
                losses[f"body_pose{suffix}"] = (
                    self.w_body_pose
                    * rotation_loss(stage["body_pose"],
                                    batch["gt_body_pose"],
                                    batch.get("gt_pose_valid"))
                )

            if self.w_shape_prior > 0 and self.gender_shape_prior is not None:
                losses[f"shape_prior{suffix}"] = (
                    self.w_shape_prior
                    * self.gender_shape_prior(
                        stage["betas"], batch.get("gender")
                    )
                )

            meas = stage.get("measurements") or out.get("measurements")
            if meas is not None:
                for name, w in self.meas_weights.items():
                    if w > 0 and name in batch:
                        valid = batch.get(f"{name}_valid")
                        pred = meas[name]
                        gt = batch[name].reshape(pred.shape)
                        err = jnp.abs(pred - gt)
                        if valid is not None:
                            v = valid.reshape(err.shape)
                            err = jnp.where(v > 0, err, 0.0)
                            denom = jnp.maximum(jnp.sum(v), 1e-6)
                            losses[f"{name}{suffix}"] = w * jnp.sum(
                                err) / denom
                        else:
                            losses[f"{name}{suffix}"] = w * jnp.mean(err)

            if self.w_identity > 0 and "identity" in batch:
                # Identity consistency: betas of the SAME person in the
                # batch pulled together (the ModelAgency multi-image
                # signal; openpose_tracks provides the ids). The
                # reference declares this loss (iterative_regressor.py
                # :500-533) but its pair indexing is broken when
                # enabled (it compares betas[first_pair] against the
                # raw index tensor `pairs[[1]]`) and every shipped
                # config has identity weight 0 — this is the intended
                # semantics, branch-free: mean squared beta difference
                # over all same-identity pairs (ids < 0 are ignored).
                ids = batch["identity"].reshape(-1)
                betas = stage["betas"]
                same = (ids[:, None] == ids[None, :]) & (ids >= 0)[:, None]
                iu = jnp.triu(same, k=1).astype(betas.dtype)
                d2 = jnp.sum(
                    (betas[:, None] - betas[None, :]) ** 2, axis=-1
                )
                losses[f"identity{suffix}"] = (
                    self.w_identity * jnp.sum(iu * d2)
                    / jnp.maximum(jnp.sum(iu), 1.0)
                )

            # Refined-target losses (reference use_a2b block,
            # iterative_regressor.py:560-576): l2 with the reference's
            # sum/B reduction, and NO stop_gradient — the loss is
            # symmetric in the reference, so the attribute head also
            # receives gradient through the (frozen) A2B mapping.
            if (self.w_beta_refined > 0 and "betas_ref" in stage):
                losses[f"beta_refined{suffix}"] = (
                    self.w_beta_refined
                    * l2_loss(stage["betas"], stage["betas_ref"])
                )
            if (self.w_vertex_refined > 0 and "v_shaped_ref" in stage
                    and "v_shaped" in stage):
                losses[f"vertex_refined{suffix}"] = (
                    self.w_vertex_refined
                    * l2_loss(stage["v_shaped"], stage["v_shaped_ref"])
                )

        # Attribute loss: predicted B2A attributes vs annotated ratings
        # (the SHAPY-A training signal; config attributes weight 1e1).
        if (self.w_attributes > 0 and "attributes" in out
                and "attributes" in batch):
            gt = batch["attributes"]
            valid = batch.get("attributes_valid")
            pred = out["attributes"]
            err = (pred - gt) ** 2
            # Reference semantics (iterative_regressor.py:540-544 with
            # WeightedMSELoss): total squared error over the valid rows
            # divided by the number of valid rows — NOT by row*dim.
            if valid is not None:
                v = valid.reshape(-1, 1)
                err = jnp.where(v > 0, err, 0.0)
                denom = jnp.maximum(jnp.sum(v), 1e-6)
            else:
                denom = err.shape[0]
            losses["attributes"] = (
                self.w_attributes * jnp.sum(err) / denom
            )

        losses["total"] = sum(
            v for k, v in losses.items() if k != "total"
        ) if losses else jnp.asarray(0.0)
        return losses

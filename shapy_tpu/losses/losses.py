"""Loss functions (pure JAX).

Behavioural spec: reference ``regressor/human_shape/losses/losses.py``
(factory at :46-75) and ``losses/robustifiers.py`` — gmof (Geman-McClure),
confidence-weighted keypoint losses, L2/weighted-L1 parameter losses,
keypoint/vertex edge losses, geodesic rotation loss.

Normalisation matches the reference exactly (loss-weight configs are
calibrated against it): KeypointLoss divides by BATCH SIZE by default
(division='batch', losses.py:178-180), never by sum(conf);
WeightedMSELoss/WeightedL1Loss divide the total sum by batch size
(:194-215); RotationDistance is the geodesic angle acos((tr-1)/2)
(:350-368); VertexEdgeLoss is squared-L2 summed per item then
batch-meaned (attributes/utils/losses.py:81-89).

All losses are plain functions (loss, not modules); the factory returns a
closure so configs keep working.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def gmof(x: Array, rho: float = 100.0) -> Array:
    """Geman-McClure robustifier (robustifiers.py GMoF)."""
    sq = x * x
    return (rho * rho) * sq / (sq + rho * rho)


def keypoint_loss(
    pred: Array,
    gt: Array,
    conf: Optional[Array] = None,
    norm_type: str = "l1",
    rho: float = 100.0,
    division: str = "batch",
) -> Array:
    """Confidence-weighted keypoint loss (losses.py KeypointLoss:150-184).

    pred/gt: (B, N, D); conf: (B, N) confidence weights.
    ``division``: 'batch' (reference default) divides the weighted sum
    by B; 'visible' by 2 * the number of conf>0 keypoints.
    """
    diff = pred - gt
    if norm_type == "l1":
        per_kp = jnp.sum(jnp.abs(diff), axis=-1)
    elif norm_type == "l2":
        per_kp = jnp.sum(diff * diff, axis=-1)
    elif norm_type == "gmof":
        per_kp = jnp.sum(gmof(diff, rho), axis=-1)
    else:
        raise ValueError(f"Unknown norm type: {norm_type}")
    if conf is not None:
        per_kp = per_kp * conf
    if division == "batch":
        return jnp.sum(per_kp) / pred.shape[0]
    if division == "visible":
        visible = (jnp.sum(conf > 0) if conf is not None
                   else pred.shape[0] * pred.shape[1])
        return jnp.sum(per_kp) / (2.0 * visible + 1e-9)
    raise ValueError(f"Unknown division: {division}")


def _batch_sum_loss(diff: Array, weights: Optional[Array]) -> Array:
    """Reference WeightedMSELoss/WeightedL1Loss reduction
    (losses.py:194-215): (weights[..., None] * diff).sum() / B."""
    if weights is not None:
        diff = diff * weights[..., None]
    return jnp.sum(diff) / diff.shape[0]


def l2_loss(pred: Array, gt: Array, weights: Optional[Array] = None
            ) -> Array:
    return _batch_sum_loss((pred - gt) ** 2, weights)


def weighted_l1_loss(pred: Array, gt: Array,
                     weights: Optional[Array] = None) -> Array:
    return _batch_sum_loss(jnp.abs(pred - gt), weights)


def keypoint_edge_loss(
    pred: Array, gt: Array, connections, conf: Optional[Array] = None,
    norm_type: str = "l1",
) -> Array:
    """Bone-vector loss over the skeleton edges (losses.py edge losses):
    compares edge vectors instead of absolute positions, which removes
    global translation and focuses on limb directions/lengths."""
    import numpy as np

    conn = jnp.asarray(np.asarray(connections), jnp.int32)
    pe = pred[:, conn[:, 1]] - pred[:, conn[:, 0]]
    ge = gt[:, conn[:, 1]] - gt[:, conn[:, 0]]
    edge_conf = None
    if conf is not None:
        edge_conf = conf[:, conn[:, 0]] * conf[:, conn[:, 1]]
    return keypoint_loss(pe, ge, edge_conf, norm_type)


def vertex_edge_loss(
    pred_verts: Array, gt_verts: Array, edges,
    norm_type: str = "l2",
) -> Array:
    """Mesh edge-vector loss (attributes VertexEdgeLoss,
    attributes/utils/losses.py:15,81-89): squared-L2 by default, summed
    over each item's edges then batch-meaned (the gt argument comes
    FIRST in the reference; argument order here follows the repo's
    pred-first convention with identical value — the diff is symmetric
    under l1/l2)."""
    import numpy as np

    e = jnp.asarray(np.asarray(edges), jnp.int32)
    pe = pred_verts[:, e[:, 1]] - pred_verts[:, e[:, 0]]
    ge = gt_verts[:, e[:, 1]] - gt_verts[:, e[:, 0]]
    diff = pe - ge
    per_elem = diff * diff if norm_type == "l2" else jnp.abs(diff)
    B = pred_verts.shape[0]
    return jnp.mean(jnp.sum(per_elem.reshape(B, -1), axis=-1))


def rotation_loss(pred: Array, gt: Array,
                  weights: Optional[Array] = None,
                  epsilon: float = 1e-7) -> Array:
    """Geodesic rotation distance (losses.py RotationDistance:350-368):
    acos(clip((trace(R_p^T R_g) - 1)/2)); unweighted -> sum / B,
    weighted -> sum / (#weights > 0)."""
    B = pred.shape[0]
    p = pred.reshape(-1, 3, 3)
    g = gt.reshape(-1, 3, 3)
    tr = jnp.einsum("bij,bij->b", p, g)
    theta = jnp.clip((tr - 1.0) * 0.5, -1.0 + epsilon, 1.0 - epsilon)
    per = jnp.arccos(theta)
    if weights is not None:
        per = per.reshape(B, -1) * weights.reshape(B, -1)
        return jnp.sum(per) / (jnp.sum(weights > 0) + epsilon)
    return jnp.sum(per) / B


def bce_loss(pred_logits: Array, gt: Array) -> Array:
    logp = jax.nn.log_sigmoid(pred_logits)
    lognp = jax.nn.log_sigmoid(-pred_logits)
    return -jnp.mean(gt * logp + (1 - gt) * lognp)


def mse_loss(pred: Array, gt: Array) -> Array:
    return jnp.mean((pred - gt) ** 2)


def l1_loss(pred: Array, gt: Array) -> Array:
    return jnp.mean(jnp.abs(pred - gt))


def bce_logits_loss(pred_logits: Array, gt: Array) -> Array:
    """nn.BCEWithLogitsLoss (reference build_loss 'bce-logits'). Same
    expression as bce_loss — kept as a distinct factory entry because
    the reference's 'bce' takes probabilities; ours is logit-stable for
    both names."""
    return bce_loss(pred_logits, gt)


def cross_entropy_loss(pred_logits: Array, gt: Array,
                       ignore_index: int = -100) -> Array:
    """nn.CrossEntropyLoss over class logits (B, C) with int labels
    (B,); ignore_index rows drop out of the mean."""
    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    valid = gt != ignore_index
    safe = jnp.where(valid, gt, 0)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, nll, 0.0)) / denom


LOSS_FACTORY: Dict[str, Callable] = {
    "keypoints": keypoint_loss,
    "gmof": lambda p, g, c=None, rho=100.0: keypoint_loss(
        p, g, c, "gmof", rho
    ),
    "l2": l2_loss,
    "weighted-l1": weighted_l1_loss,
    "keypoint-edge": keypoint_edge_loss,
    "vertex-edge": vertex_edge_loss,
    "rotation": rotation_loss,
    "bce": bce_loss,
    "bce-logits": bce_logits_loss,
    "cross-entropy": cross_entropy_loss,
    "l1": l1_loss,
    "mse": mse_loss,
}


def build_loss(loss_type: str = "l2", **kwargs) -> Callable:
    """Factory mirroring reference build_loss (losses.py:46-75); returns a
    closure binding config kwargs (norm_type, rho, ...)."""
    if loss_type not in LOSS_FACTORY:
        raise ValueError(f"Unknown loss type: {loss_type}")
    fn = LOSS_FACTORY[loss_type]
    if not kwargs:
        return fn

    def bound(*args, **kw):
        merged = {**kwargs, **kw}
        merged.pop("weight", None)
        merged.pop("type", None)
        valid = {
            k: v for k, v in merged.items()
            if k in fn.__code__.co_varnames
        }
        return fn(*args, **valid)

    return bound

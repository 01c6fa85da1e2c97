"""Evaluation metrics and alignments (batched, jittable JAX).

Behavioural spec: reference ``regressor/human_shape/utils/metrics.py``
(alignment factory :16-28, Procrustes :100-160, scale/translation/root
:162-304, PointError :333-364, v2vhdError sparse cross-topology metric
:367-456). TPU-first differences:

  * alignments are batched jnp (the reference runs numpy per batch on the
    host; here the whole metric pipeline can stay on device in the jitted
    eval step, reduced with a global mean instead of a rank-0 funnel);
  * the sparse HD point regressors (P2P-20k) are converted to padded
    gather+weight form at load time — a (P, K) gather and weighted sum —
    because scatter/sparse matmul is the wrong shape for the MXU/VPU while
    a small dense gather streams perfectly.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# -- point errors -----------------------------------------------------------


def point_error(pred: Array, gt: Array) -> Array:
    """Per-point Euclidean error, (..., P, 3) -> (..., P)."""
    return jnp.sqrt(jnp.sum((pred - gt) ** 2, axis=-1))


def _nn_dists(a: Array, b: Array, chunk: int = 2048) -> Array:
    """For each point in ``a`` (N, 3), the distance to its nearest
    neighbour in ``b`` (M, 3). Chunked |a-b|^2 expansion: each chunk is a
    (chunk, M) matmul + rowmin, so the whole sweep streams through the
    MXU instead of materialising an (N, M) matrix."""
    N = a.shape[0]
    pad = (-N) % chunk
    a_pad = jnp.pad(a, ((0, pad), (0, 0)))
    a_chunks = a_pad.reshape(-1, chunk, 3)
    b_sq = jnp.sum(b * b, axis=-1)

    def per_chunk(ac):
        d2 = (
            jnp.sum(ac * ac, axis=-1)[:, None]
            - 2.0 * ac @ b.T
            + b_sq[None]
        )
        # The expansion suffers f32 cancellation near zero; use it only to
        # pick the nearest neighbour, then recompute that one distance
        # exactly from the coordinate difference.
        idx = jnp.argmin(d2, axis=-1)
        diff = ac - b[idx]
        return jnp.sum(diff * diff, axis=-1)

    d2 = jax.lax.map(per_chunk, a_chunks).reshape(-1)[:N]
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def point_fscore(pred: Array, gt: Array, thresh: float) -> dict:
    """F-score between two point clouds at a distance threshold
    (reference metrics.py:306-330, open3d nearest-neighbour distances).

    Note: the reference computes 'recall' from pred->gt distances and
    'precision' from gt->pred (swapped vs. the textbook convention); that
    behaviour is preserved exactly.
    """
    pred = jnp.asarray(pred, jnp.float32)
    gt = jnp.asarray(gt, jnp.float32)
    pred_to_gt = _nn_dists(pred, gt)
    gt_to_pred = _nn_dists(gt, pred)
    recall = jnp.mean(pred_to_gt < thresh)
    precision = jnp.mean(gt_to_pred < thresh)
    denom = recall + precision
    fscore = jnp.where(denom > 0.0, 2 * recall * precision
                       / jnp.where(denom > 0.0, denom, 1.0), 0.0)
    return {"fscore": fscore, "precision": precision, "recall": recall}


# -- alignments -------------------------------------------------------------


def no_alignment(est: Array, gt: Array) -> Tuple[Array, Array]:
    return est, gt


def root_align(est: Array, gt: Array, root=(0,)) -> Tuple[Array, Array]:
    """Subtract the mean of the root joints from each set
    (metrics.py:279-303)."""
    idx = jnp.asarray(root)
    return (
        est - jnp.mean(est[..., idx, :], axis=-2, keepdims=True),
        gt - jnp.mean(gt[..., idx, :], axis=-2, keepdims=True),
    )


def translation_align(est: Array, gt: Array) -> Tuple[Array, Array]:
    """Mean-centre both point sets (metrics.py:232-277)."""
    return (
        est - jnp.mean(est, axis=-2, keepdims=True),
        gt - jnp.mean(gt, axis=-2, keepdims=True),
    )


def scale_align(est: Array, gt: Array) -> Tuple[Array, Array]:
    """Scale + translation alignment (metrics.py:190-230): est is scaled
    by sqrt(var(gt)/var(est)) about its mean, then translated onto gt."""
    mu1 = jnp.mean(est, axis=-2, keepdims=True)
    mu2 = jnp.mean(gt, axis=-2, keepdims=True)
    x1 = est - mu1
    x2 = gt - mu2
    var1 = jnp.sum(x1 * x1, axis=(-1, -2))
    var2 = jnp.sum(x2 * x2, axis=(-1, -2))
    scale = jnp.sqrt(var2 / jnp.maximum(var1, 1e-12))
    est_hat = scale[..., None, None] * x1 + mu2
    return est_hat, gt


def procrustes_align(est: Array, gt: Array) -> Tuple[Array, Array]:
    """Full similarity (sR, t) Procrustes alignment of est onto gt
    (metrics.py:100-160), batched over leading dims."""
    mu1 = jnp.mean(est, axis=-2, keepdims=True)
    mu2 = jnp.mean(gt, axis=-2, keepdims=True)
    x1 = est - mu1  # (..., P, 3)
    x2 = gt - mu2
    var1 = jnp.sum(x1 * x1, axis=(-1, -2))
    K = jnp.einsum("...pi,...pj->...ij", x1, x2)  # (..., 3, 3)
    U, s, Vt = jnp.linalg.svd(K)
    det = jnp.linalg.det(
        jnp.einsum("...ij,...jk->...ik", U, Vt)
    )
    Z = jnp.broadcast_to(jnp.eye(3), K.shape).copy()
    Z = Z.at[..., 2, 2].multiply(jnp.sign(det))
    # R aligns x1 onto x2: R = V Z U^T
    R = jnp.einsum("...ji,...jk,...lk->...il", Vt, Z, U)
    # scale = trace(R K) / var1 (reference step 5)
    scale = jnp.einsum(
        "...ij,...ji->...", R, K
    ) / jnp.maximum(var1, 1e-12)
    est_hat = scale[..., None, None] * jnp.einsum(
        "...ij,...pj->...pi", R, x1
    ) + mu2
    return est_hat, gt


ALIGNMENTS = {
    "none": no_alignment,
    "no": no_alignment,
    "root": root_align,
    "translation": translation_align,
    "scale": scale_align,
    "procrustes": procrustes_align,
}


def build_alignment(name: str, root=None) -> Callable:
    """Factory mirroring reference build_alignment (metrics.py:16-28)."""
    if name == "root":
        return lambda est, gt: root_align(est, gt, root or (0,))
    if name not in ALIGNMENTS:
        raise ValueError(f"Unknown alignment type: {name}")
    return ALIGNMENTS[name]


class PointError:
    """Alignment + per-point error (metrics.py:333-364)."""

    def __init__(self, alignment: str = "none", root=None, name: str = ""):
        self.alignment_name = alignment
        self.align = build_alignment(alignment, root)
        self.name = name or alignment

    def set_root(self, root) -> None:
        if self.alignment_name == "root":
            self.align = build_alignment("root", root)

    def __call__(self, est: Array, gt: Array) -> Array:
        a, b = self.align(est, gt)
        return point_error(a, b)


# -- sparse HD point regressor (P2P-20k) ------------------------------------


class SparsePointRegressor:
    """Cross-topology point metric (reference v2vhdError,
    metrics.py:367-456): regress ~20k surface points from each mesh's
    vertices with a sparse matrix, translation-align, mean distance.

    Sparse rows are stored as padded (P, K) vertex indices + weights;
    application is a gather + weighted sum.
    """

    def __init__(self, indices: np.ndarray, weights: np.ndarray,
                 align: bool = True):
        self.indices = jnp.asarray(indices, jnp.int32)  # (P, K)
        self.weights = jnp.asarray(weights, jnp.float32)  # (P, K)
        self.align = align

    @classmethod
    def from_scipy(cls, matrix, align: bool = True
                   ) -> "SparsePointRegressor":
        m = matrix.tocsr()
        P = m.shape[0]
        counts = np.diff(m.indptr)
        K = int(max(1, counts.max()))
        idx = np.zeros((P, K), np.int64)
        w = np.zeros((P, K), np.float64)
        for i in range(P):
            s, e = m.indptr[i], m.indptr[i + 1]
            idx[i, : e - s] = m.indices[s:e]
            w[i, : e - s] = m.data[s:e]
        return cls(idx, w, align=align)

    @classmethod
    def from_pickle(cls, path: str, align: bool = True
                    ) -> "SparsePointRegressor":
        import pickle

        with open(path, "rb") as f:
            matrix = pickle.load(f, encoding="latin1")
        return cls.from_scipy(matrix, align=align)

    def regress(self, vertices: Array) -> Array:
        """(B, V, 3) -> (B, P, 3)."""
        gathered = vertices[:, self.indices]  # (B, P, K, 3)
        return jnp.sum(gathered * self.weights[None, ..., None], axis=-2)

    def __call__(self, input_vertices: Array, target_vertices: Array,
                 target_regressor: Optional["SparsePointRegressor"] = None
                 ) -> Array:
        """Per-point distances (B, P) between regressed point sets."""
        tr = target_regressor or self
        p1 = self.regress(input_vertices)
        p2 = tr.regress(target_vertices)
        if self.align:
            t = jnp.mean(p2, axis=1, keepdims=True) - jnp.mean(
                p1, axis=1, keepdims=True
            )
            p1 = p1 + t
        return point_error(p1, p2)


def mpjpe(pred_joints: Array, gt_joints: Array, alignment: str = "root",
          root=(0,)) -> Array:
    """Mean per-joint position error under an alignment."""
    est, gt = build_alignment(alignment, root)(pred_joints, gt_joints)
    return jnp.mean(point_error(est, gt), axis=-1)

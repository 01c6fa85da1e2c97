"""Batched 2D convex-hull perimeter on TPU.

The reference computes slice circumferences with a per-batch-item Python
loop over ``scipy.spatial.ConvexHull`` on the CPU
(``body_measurements.py:160-179``) — the throughput bottleneck of its
measurement path, and non-differentiable.

TPU-native default: **Cauchy's formula**. For a convex body, the perimeter
equals the integral of the support function over all directions,
``L = \\int_0^{2pi} h(theta) dtheta`` with ``h(theta) = max_i p_i . u(theta)``.
Discretised with K directions this is a (N, 2) x (2, K) matmul + masked max
+ sum: one MXU-friendly, fully batched, differentiable expression. The
midpoint-rule error is O(1/K^2); with the default K=720 it is < 2e-5
relative (~0.02 mm on a ~1 m circumference), far inside the <1 mm parity
budget. Centring on the masked centroid first keeps h near-constant, which
both tightens the quadrature and conditions the max.

``hull_perimeter_exact_np`` is the host-side exact check (scipy), used by
tests and the offline evaluator for bit-parity with the reference protocol.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def hull_perimeter_support(
    points: Array,
    mask: Array,
    num_directions: int = 720,
) -> Array:
    """Perimeter of the convex hull of masked 2D points.

    Args:
      points: (..., N, 2).
      mask: (..., N) bool; invalid points are excluded.
      num_directions: quadrature resolution K.

    Returns: (...,) perimeter. Zero when fewer than 2 valid points.
    """
    k = num_directions
    theta = (jnp.arange(k, dtype=points.dtype) + 0.5) * (2.0 * jnp.pi / k)
    u = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=0)  # (2, K)

    m = mask[..., None]
    count = jnp.maximum(jnp.sum(mask, axis=-1, keepdims=True), 1)
    centroid = jnp.sum(jnp.where(m, points, 0.0), axis=-2, keepdims=True)
    centroid = centroid / count[..., None]
    centred = jnp.where(m, points - centroid, 0.0)

    # Projection as an explicit f32 broadcast, not a matmul: TPU's default
    # f32 matmul runs in bf16 passes (cost ~1.4 mm on a ~1.7 m
    # circumference, outside the <1 mm parity budget) and
    # Precision.HIGHEST fixes accuracy but is 4x slower than the VPU
    # broadcast for this K-dim=2 contraction (measured on v5e).
    proj = (
        centred[..., 0:1] * u[0][None, :] + centred[..., 1:2] * u[1][None, :]
    )  # (..., N, K)
    neg = jnp.asarray(-jnp.inf, dtype=points.dtype)
    h = jnp.max(jnp.where(m, proj, neg), axis=-2)  # (..., K)
    h = jnp.maximum(h, 0.0)  # no valid points on some direction -> 0
    perimeter = jnp.sum(h, axis=-1) * (2.0 * jnp.pi / k)
    enough = jnp.sum(mask, axis=-1) >= 2
    return jnp.where(enough, perimeter, 0.0)


def hull_perimeter_exact_np(
    points: np.ndarray, mask: Optional[np.ndarray] = None
) -> float:
    """Exact hull perimeter via scipy (host-side; parity/eval path).

    Matches the reference's hull-edge length sum
    (``body_measurements.py:160-179``).
    """
    from scipy.spatial import ConvexHull

    pts = np.asarray(points, dtype=np.float64)
    if mask is not None:
        pts = pts[np.asarray(mask, dtype=bool)]
    if pts.shape[0] < 3:
        return 0.0
    hull = ConvexHull(pts)
    seg = pts[hull.simplices]  # (E, 2, 2)
    return float(np.linalg.norm(seg[:, 1] - seg[:, 0], axis=-1).sum())

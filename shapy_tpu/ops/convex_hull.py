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
midpoint-rule error is O(1/K^2) in the worst case but far smaller for
smooth convex slices: measured against exact scipy hulls on body-scale
slices, K=256 is within 0.006 mm and K=720 within 0.0007 mm — both far
inside the <1 mm parity budget. Centring on the masked centroid first keeps h near-constant, which
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
    num_directions: int = 256,
) -> Array:
    """Perimeter of the convex hull of masked 2D points.

    Args:
      points: (..., N, 2).
      mask: (..., N) bool; invalid points are excluded.
      num_directions: quadrature resolution K.

    Returns: (...,) perimeter. Zero when fewer than 2 valid points.
    """
    return hull_perimeter_support_xz(
        points[..., 0], points[..., 1], mask, num_directions
    )


def hull_perimeter_support_xz(
    x: Array,
    z: Array,
    mask: Array,
    num_directions: int = 256,
) -> Array:
    """Support-function hull perimeter, structure-of-arrays layout.

    ``x``/``z``/``mask`` are (..., N) coordinate planes — the TPU-fast
    form: with N on the 128-wide lane axis every centering/masking pass
    runs at full width, where the (..., N, 2) AoS form above uses 2 of
    128 lanes for all of them (the measurement module's dominant cost
    before this restructure; see BENCH.md).
    """
    k = num_directions
    assert k % 2 == 0, "num_directions must be even (antipodal pairing)"
    # Midpoint angles for the FIRST half-circle only: theta_j and
    # theta_j + pi are both quadrature nodes, and h(theta + pi) =
    # max(-proj), so one (N, K/2) projection yields all K support
    # values via a max and a min reduction — half the multiply work.
    half = k // 2
    theta = (jnp.arange(half, dtype=x.dtype) + 0.5) * (2.0 * jnp.pi / k)
    cos, sin = jnp.cos(theta), jnp.sin(theta)  # (K/2,)

    count = jnp.maximum(jnp.sum(mask, axis=-1, keepdims=True), 1)
    cx = jnp.sum(jnp.where(mask, x, 0.0), axis=-1, keepdims=True) / count
    cz = jnp.sum(jnp.where(mask, z, 0.0), axis=-1, keepdims=True) / count
    # Invalid points collapse to the centroid (projection 0). Because the
    # centroid of the valid points lies inside their hull, h(theta) >= 0
    # for every direction, so the zeros can never win the max/min — no
    # per-(N, K) mask select is needed.
    xc = jnp.where(mask, x - cx, 0.0)
    zc = jnp.where(mask, z - cz, 0.0)

    # Projection as an explicit f32 broadcast, not a matmul: TPU's default
    # f32 matmul runs in bf16 passes (cost ~1.4 mm on a ~1.7 m
    # circumference, outside the <1 mm parity budget) and
    # Precision.HIGHEST fixes accuracy but is 4x slower than the VPU
    # broadcast for this K-dim=2 contraction (measured on v5e).
    proj = xc[..., None] * cos + zc[..., None] * sin  # (..., N, K/2)
    h_fwd = jnp.maximum(jnp.max(proj, axis=-2), 0.0)   # h(theta)
    h_bwd = jnp.maximum(-jnp.min(proj, axis=-2), 0.0)  # h(theta + pi)
    perimeter = (
        jnp.sum(h_fwd, axis=-1) + jnp.sum(h_bwd, axis=-1)
    ) * (2.0 * jnp.pi / k)
    enough = jnp.sum(mask, axis=-1) >= 2
    return jnp.where(enough, perimeter, 0.0)


# NOTE on a rejected design: compacting the ~500 real slice crossings out
# of the 2F padded candidates before the hull looks attractive (20x less
# projection work) but LOSES on TPU in every formulation measured on v5e
# at (384, 40960) -> 2048: cumsum-slot scatter ~950 ms/call (scatter
# serialises per update and long chains trip the device watchdog),
# stable-sort compaction 63 ms, top_k(k=2048) worse still — all vs
# 16.6 ms for the full-N masked projection itself. Dense beats sparse
# here; the optimisations that do pay are inside the projection
# (antipodal pairing + dropping the (N, K) select, above).


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

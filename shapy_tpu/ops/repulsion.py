"""Cone-field repulsion (interpenetration) loss.

Behavioural spec: reference ``mesh-mesh-intersection/
mesh_mesh_intersection/loss.py:31-317`` (Tzionas-style penetration
penalty): each receiver triangle defines a cone (axis = unnormalised
normal, base radius = circumradius, height sigma); intruder triangle
vertices inside the cone are penalised by a piecewise linear/quadratic
intensity. Branch-free: invalid (padded, -1) collision pairs contribute
zero through masks — no data-dependent gathers of nonzero() like the
torch version.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def circumcircle(triangles: Array):
    """Circumradius + circumcenter of triangles (..., 3, 3)
    (loss.py:31-66)."""
    alpha = triangles[..., 0, :] - triangles[..., 2, :]
    beta = triangles[..., 1, :] - triangles[..., 2, :]
    cross = jnp.cross(alpha, beta)
    cross_norm = jnp.linalg.norm(cross, axis=-1, keepdims=True)
    radius = (
        jnp.linalg.norm(alpha - beta, axis=-1, keepdims=True)
        / jnp.maximum(2.0 * cross_norm, 1e-12)
        * jnp.linalg.norm(alpha, axis=-1, keepdims=True)
        * jnp.linalg.norm(beta, axis=-1, keepdims=True)
    )
    center = jnp.cross(
        jnp.sum(alpha**2, axis=-1, keepdims=True) * beta
        - jnp.sum(beta**2, axis=-1, keepdims=True) * alpha,
        cross,
    ) / jnp.maximum(2.0 * jnp.sum(cross**2, axis=-1, keepdims=True),
                    1e-12)
    return radius, center + triangles[..., 2, :]


def repulsion_intensity(x: Array, sigma: float = 0.5,
                        penalize_outside: bool = True,
                        linear_max: float = 1000.0) -> Array:
    """Piecewise penalty (loss.py:68-80): linear for deep penetration,
    quadratic near the surface."""
    quad = (
        -(1.0 - 2.0 * sigma) / (4.0 * sigma**2) * x**2
        - 1.0 / (2.0 * sigma) * x
        + 0.25 * (3.0 - 2.0 * sigma)
    )
    linear_mask = (x <= -sigma) & (x > -linear_max)
    if penalize_outside:
        quad_mask = (x > -sigma) & (x < sigma)
    else:
        quad_mask = (x > -sigma) & (x < 0)
    return (
        linear_mask.astype(x.dtype) * (-x + 1.0 - sigma)
        + quad_mask.astype(x.dtype) * quad
    )


def conical_distance_field(
    points: Array,
    cone_center: Array,
    cone_radius: Array,
    cone_axis: Array,
    sigma: float = 0.5,
    penalize_outside: bool = True,
    linear_max: float = 1000.0,
    epsilon: float = 1e-6,
) -> Array:
    """Reference ``conical_distance_field`` (loss.py:127-198), vectorized
    branch EXACTLY — including its observable quirk: the vectorized path
    squares the field INSIDE (``(mask * ((1-d) * r)^2)``) and AGAIN at
    the return (``.pow(2)``), yielding ((1-axis_dist) * intensity)^4 per
    vertex where the iterative branch yields only ^2. vectorized=True is
    the reference default, so parity means reproducing the ^4.

    points: (B, C, N, 3); cone_center (B, C, 3); cone_radius (B, C, 1);
    cone_axis (B, C, 3) unit. Returns (B, C, N).
    """
    rel = points - cone_center[..., None, :]
    dot = jnp.einsum("bcvk,bck->bcv", rel, cone_axis)
    # dist_to_cone_axis (loss.py:84-124): projection distance to the
    # axis over the cone radius at that height; denominator + epsilon
    # (unconditionally, like the reference).
    perp = rel - dot[..., None] * cone_axis[..., None, :]
    numerator = jnp.linalg.norm(perp, axis=-1)
    denominator = -cone_radius / sigma * dot + cone_radius
    axis_dist = numerator / (denominator + epsilon)

    intensity = repulsion_intensity(
        dot, sigma=sigma, penalize_outside=penalize_outside,
        linear_max=linear_max,
    )
    mask = (axis_dist < 1.0).astype(points.dtype)
    field = mask * ((1.0 - axis_dist) * intensity) ** 2
    return field ** 2


def repulsion_loss(
    triangles: Array,
    collision_idxs: Array,
    sigma: float = 0.5,
    penalize_outside: bool = True,
    linear_max: float = 1000.0,
) -> Array:
    """Penetration penalty (loss.py DistanceFieldPenetrationLoss:270-317).

    triangles: (B, F, 3, 3); collision_idxs: (B, C, 2) int
    (receiver, intruder) pairs, -1-padded. Returns (B,) losses.

    Mirrors the reference forward exactly: BOTH cone fields are summed —
    intruder vertices against the receiver's cone (phi_receivers) AND
    receiver vertices against the intruder's cone (phi_intruders,
    loss.py:284-293) — and each per-vertex field value is squared once
    more in the loss (the point2plane and point-to-normal branches are
    numerically identical for unit normals, loss.py:303-310)."""
    valid = jnp.all(collision_idxs >= 0, axis=-1)  # (B, C)
    recv_idx = jnp.maximum(collision_idxs[..., 0], 0)
    intr_idx = jnp.maximum(collision_idxs[..., 1], 0)

    recv = jnp.take_along_axis(
        triangles, recv_idx[..., None, None].repeat(3, -2).repeat(3, -1),
        axis=1,
    )  # (B, C, 3, 3)
    intr = jnp.take_along_axis(
        triangles, intr_idx[..., None, None].repeat(3, -2).repeat(3, -1),
        axis=1,
    )

    def cone(tri):
        normal = jnp.cross(
            tri[..., 1, :] - tri[..., 0, :], tri[..., 2, :] - tri[..., 0, :]
        )
        axis = normal / jnp.maximum(
            jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12
        )
        radius, center = circumcircle(tri)
        return axis, radius, center

    recv_axis, recv_radius, recv_center = cone(recv)
    intr_axis, intr_radius, intr_center = cone(intr)

    phi_receivers = conical_distance_field(
        intr, recv_center, recv_radius, recv_axis, sigma=sigma,
        penalize_outside=penalize_outside, linear_max=linear_max,
    )
    phi_intruders = conical_distance_field(
        recv, intr_center, intr_radius, intr_axis, sigma=sigma,
        penalize_outside=penalize_outside, linear_max=linear_max,
    )
    per_pair = jnp.sum(phi_receivers**2 + phi_intruders**2, axis=-1)
    return jnp.sum(jnp.where(valid, per_pair, 0.0), axis=-1)

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


def repulsion_loss(
    triangles: Array,
    collision_idxs: Array,
    sigma: float = 0.5,
    penalize_outside: bool = True,
    linear_max: float = 1000.0,
) -> Array:
    """Penetration penalty.

    triangles: (B, F, 3, 3); collision_idxs: (B, C, 2) int
    (receiver, intruder) pairs, -1-padded. Returns (B,) losses.
    """
    B = triangles.shape[0]
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

    normal = jnp.cross(
        recv[..., 1, :] - recv[..., 0, :], recv[..., 2, :] - recv[..., 0, :]
    )
    axis = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12
    )
    radius, center = circumcircle(recv)

    # Intruder vertices relative to the cone center
    rel = intr - center[..., None, :]  # (B, C, 3verts, 3)
    dot = jnp.einsum("bcvk,bck->bcv", rel, axis)  # height along axis

    # Distance to the cone axis, normalised by the local cone radius
    # (loss.py dist_to_cone_axis): <1 inside, 1 on surface, >1 outside.
    perp = rel - dot[..., None] * axis[..., None, :]
    numerator = jnp.linalg.norm(perp, axis=-1)
    denominator = -radius / sigma * dot + radius
    axis_dist = numerator / jnp.where(
        jnp.abs(denominator) > 1e-6, denominator, 1e-6
    )

    # Height within the cone: penalise vertices below the surface
    # (negative dot) whose axis distance is < 1.
    inside = (axis_dist < 1.0) & (dot < 0) & (dot > -linear_max)
    intensity = repulsion_intensity(
        dot, sigma=sigma, penalize_outside=penalize_outside,
        linear_max=linear_max,
    )
    per_pair = jnp.sum(
        jnp.where(inside, intensity, 0.0), axis=-1
    )  # (B, C)
    return jnp.sum(jnp.where(valid, per_pair, 0.0), axis=-1)

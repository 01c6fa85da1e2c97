"""Mesh / landmark geometry primitives (pure JAX).

Semantics follow the reference (regressor/human_shape/models/body_models/
lbs.py:52-239, mesh-mesh-intersection/body_measurements/body_measurements.py
:201-215) but are expressed as batched einsums so XLA can fuse them and map
the contractions onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def blend_shapes(betas: Array, shape_dirs: Array) -> Array:
    """Per-vertex displacement from blend-shape coefficients.

    betas: (B, L); shape_dirs: (V, 3, L) -> (B, V, 3).
    Equivalent to reference ``blend_shapes`` (lbs.py:218-239).
    """
    return jnp.einsum("bl,vkl->bvk", betas, shape_dirs)


def vertices2joints(J_regressor: Array, vertices: Array) -> Array:
    """Regress joints from vertices. J_regressor: (J, V); vertices: (B, V, 3)."""
    return jnp.einsum("bvk,jv->bjk", vertices, J_regressor)


def vertices2landmarks(
    vertices: Array, faces: Array, lmk_faces_idx: Array, lmk_bary_coords: Array
) -> Array:
    """Barycentric landmark interpolation.

    vertices: (B, V, 3); faces: (F, 3) int; lmk_faces_idx: (L,) or (B, L) int;
    lmk_bary_coords: (L, 3) or (B, L, 3) -> (B, L, 3).
    Equivalent to reference ``vertices2landmarks`` (lbs.py:52-94) but supports
    per-batch face indices (needed by the dynamic face contour) natively.
    """
    B = vertices.shape[0]
    if lmk_faces_idx.ndim == 1:
        lmk_faces_idx = jnp.broadcast_to(lmk_faces_idx, (B,) + lmk_faces_idx.shape)
    if lmk_bary_coords.ndim == 2:
        lmk_bary_coords = jnp.broadcast_to(
            lmk_bary_coords, (B,) + lmk_bary_coords.shape
        )
    lmk_faces = faces[lmk_faces_idx]  # (B, L, 3)
    lmk_vertices = jnp.take_along_axis(
        vertices[:, :, None, :], lmk_faces[..., None], axis=1
    )  # (B, L, 3, 3)
    return jnp.sum(lmk_vertices * lmk_bary_coords[..., None], axis=-2)


def gather_triangles(vertices: Array, faces: Array) -> Array:
    """vertices: (B, V, 3), faces: (F, 3) -> triangles (B, F, 3, 3)."""
    return vertices[:, faces]


def signed_volume(triangles: Array) -> Array:
    """Signed volume of a closed triangle mesh, (B, F, 3, 3) -> (B,).

    Divergence-theorem tetra sum; sign convention and term order match the
    reference ``compute_mass`` determinant expansion
    (body_measurements.py:201-215), |.|/6 applied here.
    """
    x = triangles[..., 0]
    y = triangles[..., 1]
    z = triangles[..., 2]
    det = (
        -x[..., 2] * y[..., 1] * z[..., 0]
        + x[..., 1] * y[..., 2] * z[..., 0]
        + x[..., 2] * y[..., 0] * z[..., 1]
        - x[..., 0] * y[..., 2] * z[..., 1]
        - x[..., 1] * y[..., 0] * z[..., 2]
        + x[..., 0] * y[..., 1] * z[..., 2]
    )
    return jnp.abs(jnp.sum(det, axis=-1)) / 6.0


def face_barycentric_point(
    triangles: Array, face_idx: int, bary: Array
) -> Array:
    """Anchor point from a fixed face + barycentric weights.

    triangles: (B, F, 3, 3); bary: (3,) -> (B, 3).
    """
    tri = triangles[:, face_idx]  # (B, 3, 3)
    return jnp.sum(tri * jnp.asarray(bary).reshape(1, 3, 1), axis=1)


def edge_vectors(vertices: Array, edges: Array) -> Array:
    """vertices: (B, V, 3), edges: (E, 2) int -> (B, E, 3) edge vectors."""
    return vertices[:, edges[:, 1]] - vertices[:, edges[:, 0]]


def faces_to_edges(faces) -> "jnp.ndarray":
    """Unique undirected edges (E, 2) from faces (F, 3). Static / host-side."""
    import numpy as np

    f = np.asarray(faces)
    e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], axis=0)
    e = np.sort(e, axis=1)
    e = np.unique(e, axis=0)
    return e

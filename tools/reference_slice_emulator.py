"""Bit-faithful numpy emulation of the reference's plane-slice point set.

The reference computes chest/waist/hips circumferences by intersecting a
2-triangle plane quad with the body mesh via a CUDA kernel
(``mesh-mesh-intersection/src/mesh_mesh_intersect_cuda_op.cu``) and taking a
scipy ConvexHull perimeter over the returned points
(``body_measurements.py:130-179``).  The kernel's *observable* point set is
NOT "all plane-edge crossings":

1. ``find_triangle_triangle_intersection_points`` (cuda_op.cu:376-516)
   records exactly ONE distinct point per colliding (query-tri, body-tri)
   pair.  Its "second point" searches can never succeed: pass 1's second ray
   intersects the degenerate triangle ``(v1, v1, v2)`` (:483, always
   det~0 -> parallel reject) and both passes' shifted-origin re-tests leave
   the plane so the re-hit parameter is ``-EPSILON < 0`` and is discarded by
   the ``t < 0`` check.  The fallback (:508-513) duplicates point 1.
2. Pass 1 casts the three *query* edges (the quad edges, including the
   [-1,-1]->[1,1] diagonal that passes through the body) against the body
   triangle.  ``ray_triangle_intersect`` rejects ``|det| < EPSILON`` with
   EPSILON = 1e-4 (:54-56, :213) where ``det = dir . (v0v2 x v0v1)``; for a
   body triangle ``|n| = 2*area ~ 1e-4``, so in-plane diagonal hits are
   accepted only for large, ray-facing triangles.
3. Pass 2 casts the three *body* edges (in local order e01, e12, e20)
   against the query triangle and keeps the FIRST in-range hit -- so of a
   sliced triangle's two crossing edges only one is reported, and a mesh
   edge's crossing point appears iff it is the first crossing edge of one of
   its two adjacent triangles.  det here is ``4 * dir_y``: body edges with
   |dy| < 2.5e-5 m are dropped.
4. The wrapper filter ``collision_faces[ii] > 0`` (body_measurements.py:161)
   drops legitimate face id 0 along with the -1 padding.
5. ``max_collisions=256`` per query triangle is never bounds-checked in
   ``traverse_bvh`` (:524-588): overflow writes into the next query slot.

This module reproduces 1-4 exactly (float64 math, float32-scale cutoffs) and
reports when 5 would trigger.  Used by tests/test_golden_measurements.py to
pin the repo's measurement path against the only real-mesh golden in the
environment (reference samples img_00.npz).
"""

from __future__ import annotations

import numpy as np

EPSILON = 1e-4  # cuda_op.cu:54-56


def _plane_quad(h: float):
    """The reference's finite plane quad at height h (body_measurements.py:86-97)."""
    verts = np.array(
        [[-1.0, h, -1.0], [1.0, h, -1.0], [1.0, h, 1.0], [-1.0, h, 1.0]]
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    return verts[faces]  # (2, 3, 3)


def _ray_tri_batch(orig, dirs, v0, v1, v2):
    """Vectorized Moller-Trumbore matching cuda_op.cu:201-231.

    orig/dirs: (..., 3); v0/v1/v2: (..., 3) broadcastable.
    Returns (hit, t, point); hit obeys the reference's checks in order:
    |det| < EPSILON reject, u in [0,1], v >= 0, u+v <= 1.  t is only valid
    where hit.
    """
    v0v1 = v1 - v0
    v0v2 = v2 - v0
    pvec = np.cross(dirs, v0v2)
    det = np.sum(v0v1 * pvec, axis=-1)
    ok = np.abs(det) >= EPSILON
    inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    tvec = orig - v0
    u = np.sum(tvec * pvec, axis=-1) * inv
    ok &= (u >= 0) & (u <= 1)
    qvec = np.cross(tvec, v0v1)
    v = np.sum(dirs * qvec, axis=-1) * inv
    ok &= (v >= 0) & (u + v <= 1)
    t = np.sum(v0v2 * qvec, axis=-1) * inv
    point = orig + t[..., None] * dirs
    return ok, t, point


def _sat_collide(qtri, tris):
    """TriangleTriangleIsectSepAxis (cuda_op.cu:268-343), vectorized over tris.

    qtri: (3, 3); tris: (F, 3, 3).  11 axes via SatCrossEdge; an axis with
    ~zero squared norm cannot separate (CMP check :159-166 -> axis skipped).
    """
    F = tris.shape[0]
    q0, q1, q2 = qtri
    t0, t1, t2 = tris[:, 0], tris[:, 1], tris[:, 2]

    def sat_cross_edge(a, b, c, d):
        ab = b - a
        cd = d - c
        res = np.cross(ab, cd)
        # CMP(dot(ab,cd), 0) fallback branch (:156-167)
        dot_ = np.sum(ab * cd, axis=-1)
        near0 = np.abs(dot_) <= np.finfo(np.float32).eps * np.maximum(
            1.0, np.abs(dot_)
        )
        if np.any(near0):
            axis = np.cross(ab, c - a)
            alt = np.cross(ab, axis)
            res = np.where(near0[..., None], alt, res)
        return res

    bq = np.broadcast_to
    axes = [
        sat_cross_edge(bq(q0, (F, 3)), bq(q1, (F, 3)), bq(q1, (F, 3)), bq(q2, (F, 3))),
        sat_cross_edge(t0, t1, t1, t2),
    ]
    for qa, qb in ((q0, q1), (q1, q2), (q2, q0)):
        for ta, tb in ((t0, t1), (t1, t2), (t2, t0)):
            axes.append(sat_cross_edge(bq(qa, (F, 3)), bq(qb, (F, 3)), ta, tb))

    collide = np.ones(F, dtype=bool)
    for ax in axes:
        # interval overlap on this axis (cuda_op.cu:256-266)
        pq = np.stack(
            [np.sum(ax * bq(q, ax.shape), axis=-1) for q in (q0, q1, q2)], axis=-1
        )
        pt = np.stack(
            [np.sum(ax * t, axis=-1) for t in (t0, t1, t2)], axis=-1
        )
        qmin, qmax = pq.min(-1), pq.max(-1)
        tmin, tmax = pt.min(-1), pt.max(-1)
        overlap = (qmin <= tmax) & (tmin <= qmax)
        # a ~zero axis can't separate (CMP(dot(axes,axes), 0) check :335)
        nz = np.sum(ax * ax, axis=-1) > np.finfo(np.float32).eps
        collide &= overlap | ~nz
    return collide


def emulate_slice_points(triangles: np.ndarray, plane_h: float,
                         max_collisions: int = 256):
    """Emulate one plane-vs-mesh CUDA call + wrapper filtering.

    triangles: (F, 3, 3) float array (one batch item).
    Returns dict with per-query-triangle collision face ids and the single
    recorded (duplicated) point per collision, plus the filtered (x, z)
    point set the reference feeds scipy's ConvexHull.
    """
    tris = np.asarray(triangles, dtype=np.float64)
    F = tris.shape[0]
    qtris = _plane_quad(float(plane_h))

    all_faces, all_points, per_query_counts = [], [], []
    for q in range(2):
        qtri = qtris[q]
        collide = _sat_collide(qtri, tris)
        idxs = np.nonzero(collide)[0]
        per_query_counts.append(len(idxs))
        sub = tris[idxs]  # (N, 3, 3)
        N = len(idxs)
        point = np.zeros((N, 3))
        found = np.zeros(N, dtype=bool)

        # pass 1: query edges vs body triangle (cuda_op.cu:407-447)
        qv = qtri
        for (a, b) in ((0, 1), (1, 2), (2, 0)):
            orig = np.broadcast_to(qv[a], (N, 3))
            dirs = np.broadcast_to(qv[b] - qv[a], (N, 3))
            hit, t, pt = _ray_tri_batch(orig, dirs, sub[:, 0], sub[:, 1], sub[:, 2])
            ok = hit & (t >= 0) & (t <= 1) & ~found
            point[ok] = pt[ok]
            found |= ok

        # pass 2: body edges vs query triangle (cuda_op.cu:450-497)
        for (a, b) in ((0, 1), (1, 2), (2, 0)):
            orig = sub[:, a]
            dirs = sub[:, b] - sub[:, a]
            hit, t, pt = _ray_tri_batch(
                orig, dirs,
                np.broadcast_to(qv[0], (N, 3)),
                np.broadcast_to(qv[1], (N, 3)),
                np.broadcast_to(qv[2], (N, 3)),
            )
            ok = hit & (t >= 0) & (t <= 1) & ~found
            point[ok] = pt[ok]
            found |= ok

        all_faces.append(idxs)
        all_points.append(point)

    faces = np.concatenate(all_faces)
    points = np.concatenate(all_points)
    # wrapper filter: collision_faces > 0 (body_measurements.py:161) drops
    # face id 0 along with -1 padding.
    keep = faces > 0
    pts_xz = points[keep][:, [0, 2]]
    # each point is duplicated (isect2 := isect1 fallback) -- irrelevant for
    # the hull but kept for completeness of the emulation.
    pts_xz_dup = np.repeat(pts_xz, 2, axis=0)
    return {
        "faces": faces,
        "points": points,
        "per_query_counts": per_query_counts,
        "overflow": any(c > max_collisions for c in per_query_counts),
        "hull_input_xz": pts_xz_dup,
    }


def reference_circumference(triangles: np.ndarray, plane_h: float):
    """Emulated reference circumference -> (perimeter_m, debug_dict)."""
    from scipy.spatial import ConvexHull

    out = emulate_slice_points(triangles, plane_h)
    pts = out["hull_input_xz"]
    hull = ConvexHull(pts)
    idx = hull.simplices.reshape(-1)
    seg = pts[idx].reshape(-1, 2, 2)
    return float(np.sqrt(((seg[:, 1] - seg[:, 0]) ** 2).sum(-1)).sum()), out


if __name__ == "__main__":
    import io
    import torch
    import torch.storage

    torch.storage._load_from_bytes = lambda b: torch.load(
        io.BytesIO(b), map_location="cpu", weights_only=False
    )
    d = np.load(
        "/root/reference/samples/shapy_fit_for_virtual_measurements/img_00.npz",
        allow_pickle=True,
    )
    golden = {k: float(v[0]) for k, v in d["measurements"].item().items()}
    v_shaped = d["v_shaped"].astype(np.float32)
    faces = d["faces"].astype(np.int64)
    tris = v_shaped[faces]  # (F, 3, 3)

    import sys
    sys.path.insert(0, "/root/repo")
    from shapy_tpu.measure.measurements import MeasurementAnchors

    anchors = MeasurementAnchors.from_yaml(model_type="smplx")
    for name in ("chest", "waist", "hips"):
        a = getattr(anchors, name)
        tri = tris[a.face_idx].astype(np.float32)
        h = float((tri * np.asarray(a.bary, np.float32)[:, None]).sum(0)[1])
        value, out = reference_circumference(tris, h)
        print(
            f"{name}: emulated={value:.6f} golden={golden[name]:.6f} "
            f"diff={1000*(value-golden[name]):+.3f} mm  "
            f"counts={out['per_query_counts']} overflow={out['overflow']}"
        )

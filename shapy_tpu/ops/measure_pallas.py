"""Fused measurement Pallas kernel: plane-slice + support-function hull
+ mesh volume in one VMEM pass.

The BASELINE north star names this fusion explicitly: "the mesh-mesh-
intersection CUDA extension used for virtual measurements is replaced by
a Pallas plane-slice/convex-hull kernel". The jnp path
(:mod:`shapy_tpu.measure.measurements`) materialises per-face
intersection points and relies on XLA to fuse the direction projections
into the max-reduce; this kernel guarantees the fusion: each
(batch, face-tile) step slices the three measurement planes, projects the
segment endpoints onto the K support directions, and folds a running
per-direction max plus the signed-volume partial sum -- nothing but the
(B, K, 128) support table and (B, 8, 128) volume cell leave VMEM.

Mosaic layout notes (learned the hard way):
  * no trailing-dim-3 vectors; faces live on the LANE axis, the 9
    triangle coordinates are sublane ROWS of a (B, 16, Fp) operand;
  * no nonzero lane-offset slices ("Not implemented: Offset change"):
    cos/sin direction tables are separate lane-replicated operands, and
    the per-measurement support column is updated with an iota mask over
    the full (K, 128) block instead of a lane slice;
  * first-visit initialisation is folded into the read side (select on
    grid step) -- a @pl.when writer aliasing RMW targets is subject to
    effect reordering.

Padded faces are all-zero: no plane crossings and zero volume.

Performance note (measured, v5e, B=128, F=20480, K=768): this kernel runs
in ~24 ms vs ~9 ms for the jnp path in shapy_tpu.measure — XLA lowers the
direction projections to an MXU matmul while this kernel's lane-layout
constraints force VPU broadcasts. The framework therefore DEFAULTS to the
jnp path; the kernel is kept as the explicitly-fused implementation (for
parity with the BASELINE north-star description, and as the starting
point for low-precision variants where manual control pays).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

NEG = -1e30


def _measure_kernel(
    heights_ref,  # (1, 8, 128): rows 0-2 = plane heights, replicated
    tris_ref,     # (1, 16, TILE): rows x0 y0 z0 x1 y1 z1 x2 y2 z2
    cos_ref,      # (K, 128) lane-replicated cos(theta_k)
    sin_ref,      # (K, 128) lane-replicated sin(theta_k)
    support_ref,  # out (1, K, 128): lanes 0-2 = per-measurement support
    vol_ref,      # out (1, 8, 128): element [0, 0] read back
):
    import jax.experimental.pallas as pl

    k_idx = pl.program_id(1)
    step = pl.program_id(2)
    first = step == 0
    k_zero = k_idx == 0

    tri = tris_ref[0]  # (16, TILE)
    x = (tri[0:1, :], tri[3:4, :], tri[6:7, :])
    y = (tri[1:2, :], tri[4:5, :], tri[7:8, :])
    z = (tri[2:3, :], tri[5:6, :], tri[8:9, :])

    det = (
        -x[2] * y[1] * z[0] + x[1] * y[2] * z[0] + x[2] * y[0] * z[1]
        - x[0] * y[2] * z[1] - x[1] * y[0] * z[2] + x[0] * y[1] * z[2]
    )
    # Volume accumulates only on the k==0 pass (the face tile is visited
    # once per K-chunk); init folded into the read side.
    partial_vol = jnp.sum(det)
    prev_vol = jnp.where(
        first & k_zero, jnp.zeros_like(vol_ref[...]), vol_ref[...]
    )
    vol_ref[...] = prev_vol + jnp.where(k_zero, partial_vol, 0.0)

    cos_col = cos_ref[:, 0:1]  # (K, 1)
    sin_col = sin_ref[:, 0:1]
    K = cos_ref.shape[0]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K, 128), 2)
    supp = jnp.where(
        first, jnp.full_like(support_ref[...], NEG), support_ref[...]
    )

    ea = (0, 1, 2)
    eb = (1, 2, 0)
    for m in range(3):
        h = heights_ref[0, m:m + 1, 0:1]  # (1, 1)
        s = tuple(y[i] - h for i in range(3))
        crossing = []
        px = []
        pz = []
        for a, b in zip(ea, eb):
            cross = (s[a] * s[b]) < 0.0
            denom = s[a] - s[b]
            t = s[a] / jnp.where(jnp.abs(denom) > 1e-20, denom, 1e-20)
            crossing.append(cross)
            px.append(x[a] + t * (x[b] - x[a]))
            pz.append(z[a] + t * (z[b] - z[a]))
        valid = (
            crossing[0].astype(jnp.int32)
            + crossing[1].astype(jnp.int32)
            + crossing[2].astype(jnp.int32)
        ) == 2  # (1, TILE)
        fx = jnp.where(crossing[0], px[0], px[1])
        fz = jnp.where(crossing[0], pz[0], pz[1])
        gx = jnp.where(crossing[2], px[2], px[1])
        gz = jnp.where(crossing[2], pz[2], pz[1])

        def proj_max(ax, az):
            # (K, 1) * (1, TILE) -> (K, TILE); masked max over faces.
            proj = cos_col * ax + sin_col * az
            return jnp.max(
                jnp.where(valid, proj, NEG), axis=1, keepdims=True
            )  # (K, 1)

        tile_max = jnp.maximum(proj_max(fx, fz), proj_max(gx, gz))
        # Fold into support lane m via an iota mask (no lane-offset
        # slicing).
        supp = jnp.where(
            lane == m,
            jnp.maximum(supp, tile_max[None]),
            supp,
        )
    support_ref[...] = supp


@functools.partial(
    jax.jit, static_argnames=("num_directions", "tile", "interpret")
)
def fused_measurements(
    triangles: Array,
    plane_heights: Array,
    num_directions: int = 768,
    tile: int = 2048,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """triangles: (B, F, 3, 3); plane_heights: (B, 3) [chest, waist, hips].

    Returns (circumferences (B, 3), volume (B,)).

    Mosaic tiling requires num_directions to be a multiple of 8 and tile
    a multiple of 128 (defaults satisfy both).
    """
    import jax.experimental.pallas as pl

    B, F = triangles.shape[:2]
    Fp = ((F + tile - 1) // tile) * tile
    K = num_directions

    # (B, 16, Fp): 9 coordinate rows, faces on lanes.
    coords = jnp.transpose(triangles.reshape(B, F, 9), (0, 2, 1))
    coords = jnp.pad(coords, ((0, 0), (0, 7), (0, Fp - F)))
    heights = jnp.broadcast_to(
        jnp.pad(plane_heights.astype(jnp.float32), ((0, 0), (0, 5)))[
            :, :, None
        ],
        (B, 8, 128),
    )
    theta = (jnp.arange(K, dtype=jnp.float32) + 0.5) * (2.0 * np.pi / K)
    cos = jnp.broadcast_to(jnp.cos(theta)[:, None], (K, 128))
    sin = jnp.broadcast_to(jnp.sin(theta)[:, None], (K, 128))

    # K is chunked into its own grid dimension to bound the live
    # (K_chunk, TILE) projection intermediates within VMEM.
    k_chunk = min(K, 128)
    assert K % k_chunk == 0
    support, vol = pl.pallas_call(
        _measure_kernel,
        grid=(B, K // k_chunk, Fp // tile),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda b, k, f: (b, 0, 0)),
            pl.BlockSpec((1, 16, tile), lambda b, k, f: (b, 0, f)),
            pl.BlockSpec((k_chunk, 128), lambda b, k, f: (k, 0)),
            pl.BlockSpec((k_chunk, 128), lambda b, k, f: (k, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, k_chunk, 128), lambda b, k, f: (b, k, 0)),
            pl.BlockSpec((1, 8, 128), lambda b, k, f: (b, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, K, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        ),
        interpret=interpret,
    )(heights, coords, cos, sin)
    support = jnp.transpose(support[:, :, :3], (0, 2, 1))  # (B, 3, K)

    # No centroid subtraction is needed: for a uniform direction grid
    # sum_k u_k = 0 exactly, so the quadrature sum is translation
    # invariant -- PROVIDED no clamping is applied (the origin may sit
    # outside a slice, making some support values legitimately negative).
    # A measurement with no crossing faces keeps NEG sentinels -> 0.
    has_points = jnp.all(support > NEG * 0.5, axis=-1)
    circumference = jnp.where(
        has_points,
        jnp.sum(support, axis=-1) * (2.0 * np.pi / K),
        0.0,
    )
    volume = jnp.abs(vol[:, 0, 0]) / 6.0
    return circumference, volume

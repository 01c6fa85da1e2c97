"""Crop / warp between full image and the network's square input crop.

Behavioural spec: reference ``regressor/human_shape/utils/
transf_utils.py:9-100`` (the hourglass convention: the crop covers a
``200 * scale`` px square centred at ``center``, resampled to ``res``).

Two implementations:
  * ``crop_image`` — host-side cv2 warpAffine, used by the data loader
    (one affine instead of the reference's pad+slice+rotate+resize chain —
    same map, fewer resamplings);
  * ``jax_bilinear_crop`` — the same affine warp as an XLA gather, so
    preprocessing can fuse into the jitted forward step and batch on
    device (the BASELINE "fuse crop+normalize into the model" item).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

REF_BBOX_SIZE = 200.0


def crop_to_image_affine(
    center: Sequence[float],
    scale: float,
    res: Tuple[int, int],
    rot_deg: float = 0.0,
) -> np.ndarray:
    """3x3 matrix mapping CROP pixel coords -> IMAGE pixel coords.

    Inverse of reference ``get_transform`` (transf_utils.py:9-37): the
    crop spans ``200*scale`` px centred at ``center``, optionally rotated
    about the crop centre.
    """
    h = REF_BBOX_SIZE * scale
    out_h, out_w = res
    # crop -> image (no rotation): x_img = x_crop * h/out + (cx - h/2)
    A = np.array(
        [
            [h / out_w, 0.0, center[0] - 0.5 * h],
            [0.0, h / out_h, center[1] - 0.5 * h],
            [0.0, 0.0, 1.0],
        ],
        dtype=np.float64,
    )
    if rot_deg != 0.0:
        # Rotation is applied about the crop centre, in crop coordinates
        # (transf_utils.py:21-36, inverted).
        rad = np.deg2rad(rot_deg)
        sn, cs = np.sin(rad), np.cos(rad)
        c = np.array([out_w / 2.0, out_h / 2.0])
        R = np.array(
            [
                [cs, -sn, c[0] - cs * c[0] + sn * c[1]],
                [sn, cs, c[1] - sn * c[0] - cs * c[1]],
                [0.0, 0.0, 1.0],
            ]
        )
        A = A @ R
    return A


def image_to_crop_affine(center, scale, res, rot_deg: float = 0.0
                         ) -> np.ndarray:
    return np.linalg.inv(crop_to_image_affine(center, scale, res, rot_deg))


def crop_image(
    img: np.ndarray,
    center,
    scale: float,
    res: Tuple[int, int] = (256, 256),
    rot_deg: float = 0.0,
) -> np.ndarray:
    """Extract the (res x res) crop with one affine warp (host-side)."""
    import cv2

    M = image_to_crop_affine(center, scale, res, rot_deg)[:2]
    return cv2.warpAffine(
        img, M.astype(np.float32), (res[1], res[0]),
        flags=cv2.INTER_LINEAR,
    ).astype(np.float32)


def transform_points(points: np.ndarray, affine: np.ndarray) -> np.ndarray:
    """Apply a 3x3 affine to (..., 2) points."""
    ph = np.concatenate(
        [points, np.ones_like(points[..., :1])], axis=-1
    )
    out = ph @ affine.T
    return out[..., :2]


def jax_bilinear_crop(images, affines, res: Tuple[int, int] = (256, 256)):
    """Batched on-device crop: images (B, H, W, C) + crop->image affines
    (B, 3, 3) -> (B, res, res, C) crops, bilinear, zero padding.

    Pure XLA (gathers + lerps), so it fuses with normalisation and the
    backbone stem under one jit.
    """
    import jax.numpy as jnp

    B, H, W, C = images.shape
    out_h, out_w = res
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (out_h, out_w)
    ones = jnp.ones_like(gx)
    grid = jnp.stack([gx, gy, ones], axis=-1).reshape(-1, 3)  # (P, 3)

    src = jnp.einsum("bij,pj->bpi", jnp.asarray(affines, jnp.float32), grid)
    sx, sy = src[..., 0], src[..., 1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0

    def sample(yi, xi):
        valid = (
            (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        )
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = images.reshape(B, H * W, C)
        idx = yi_c * W + xi_c
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return jnp.where(valid[..., None], vals, 0.0)

    v00 = sample(y0, x0)
    v01 = sample(y0, x0 + 1)
    v10 = sample(y0 + 1, x0)
    v11 = sample(y0 + 1, x0 + 1)
    top = v00 * (1 - wx)[..., None] + v01 * wx[..., None]
    bot = v10 * (1 - wx)[..., None] + v11 * wx[..., None]
    out = top * (1 - wy)[..., None] + bot * wy[..., None]
    return out.reshape(B, out_h, out_w, C)

"""Camera projection models (weak-perspective and perspective).

Behavioural spec: reference ``regressor/human_shape/models/camera/
camera_projection.py:44-213``. Notable reference quirks preserved:

  * weak-perspective applies scale AFTER adding the image-plane translation
    unless ``scale_first`` (camera_projection.py:202-208),
  * the positive-scale squashing function (softplus/exp/none) is applied to
    the raw camera parameter by the caller, and the camera *mean* is the
    pre-image of ``mean_scale`` under that function
    (camera_projection.py:71-79).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

DEFAULT_FOCAL_LENGTH = 5000.0


@dataclass(frozen=True)
class WeakPerspectiveCamera:
    scale_first: bool = False

    def __call__(self, points: Array, scale: Array, translation: Array,
                 **kwargs) -> Array:
        """points (B, N, 3), scale (B, 1), translation (B, 2) -> (B, N, 2)."""
        s = scale.reshape(-1, 1, 1)
        t = translation.reshape(-1, 1, 2)
        if self.scale_first:
            return s * points[..., :2] + t
        return s * (points[..., :2] + t)


@dataclass(frozen=True)
class PerspectiveCamera:
    focal_length: float = DEFAULT_FOCAL_LENGTH

    def __call__(
        self,
        points: Array,
        focal_length: Optional[Array] = None,
        translation: Optional[Array] = None,
        rotation: Optional[Array] = None,
        camera_center: Optional[Array] = None,
        **kwargs,
    ) -> Array:
        B = points.shape[0]
        if rotation is None:
            rotation = jnp.broadcast_to(jnp.eye(3, dtype=points.dtype),
                                        (B, 3, 3))
        if translation is None:
            translation = jnp.zeros((B, 3), dtype=points.dtype)
        if camera_center is None:
            camera_center = jnp.zeros((B, 2), dtype=points.dtype)
        if focal_length is None:
            focal_length = jnp.full((B,), self.focal_length,
                                    dtype=points.dtype)
        focal_length = jnp.reshape(focal_length, (-1, 1, 1))
        # Note the reference's transpose convention: x' = x R^T + t
        # (camera_projection.py:161-164).
        p = jnp.einsum("bji,bmi->bmj", rotation, points) \
            + translation[:, None]
        # Sign-preserving z clamp: at init the regressed depth passes
        # near zero; an unguarded divide returns NaNs that poison the
        # whole loss.
        z = p[..., 2:3]
        z = jnp.where(jnp.abs(z) < 1e-6, jnp.where(z < 0, -1e-6, 1e-6), z)
        img = p[..., :2] / z
        return focal_length * img + camera_center.reshape(-1, 1, 2)


def _softplus_inverse(y: float) -> float:
    # log(e^y - 1), computed stably: for large y, expm1 overflows while
    # the true value approaches y + log(1 - e^-y) ~ y (matters for the
    # persp focal mean, y = 5000).
    if y > 30.0:
        return float(y + np.log1p(-np.exp(-y)))
    return float(np.log(np.expm1(y)))


def build_cam_proj(camera_cfg: Optional[Dict] = None) -> Dict:
    """Camera + mean + positive-scale function
    (camera_projection.py:44-89)."""
    cfg = dict(camera_cfg or {})
    cam_type = cfg.get("type", "weak-persp")
    pos_func = cfg.get("pos_func", "softplus")

    if pos_func == "softplus":
        scale_func: Callable[[Array], Array] = jax.nn.softplus
    elif pos_func == "exp":
        scale_func = jnp.exp
    elif pos_func in ("none", "None"):
        scale_func = lambda x: x  # noqa: E731
    else:
        raise ValueError(f"Unknown positive scaling function: {pos_func}")

    if cam_type.lower() == "persp":
        if pos_func == "softplus":
            mean_f = _softplus_inverse(DEFAULT_FOCAL_LENGTH)
        elif pos_func == "exp":
            mean_f = float(np.log(DEFAULT_FOCAL_LENGTH))
        else:
            mean_f = DEFAULT_FOCAL_LENGTH
        # NOTE: the reference pairs dim=4 with a 3-entry mean
        # (camera_projection.py:67-69) — internally inconsistent, and
        # its param_dim is derived from the concatenated means
        # (iterative_regressor.py:107-108), so 'persp' cannot actually
        # run there. Here the mean matches the declared dim:
        # [focal, tx, ty, tz]; mean depth places the body in front of
        # the camera at the distance the weak-persp mean implies
        # (z = 2f / (mean_scale * crop) ~ 43 m for f=5000, crop 256).
        mean_z = 2.0 * DEFAULT_FOCAL_LENGTH / (0.9 * 256.0)
        return {
            "camera": PerspectiveCamera(),
            "mean": np.asarray([mean_f, 0.0, 0.0, mean_z], np.float32),
            "scale_func": scale_func,
            "dim": 4,
        }
    if cam_type.lower() == "weak-persp":
        wp = dict(cfg.get("weak_persp") or {})
        mean_scale = float(wp.get("mean_scale", 0.9))
        if pos_func == "softplus":
            mean_scale = _softplus_inverse(mean_scale)
        elif pos_func == "exp":
            mean_scale = float(np.log(mean_scale))
        return {
            "camera": WeakPerspectiveCamera(
                scale_first=bool(wp.get("scale_first", False))
            ),
            "mean": np.asarray([mean_scale, 0.0, 0.0], np.float32),
            "scale_func": scale_func,
            "dim": 3,
        }
    raise ValueError(f"Unknown camera type: {cam_type}")

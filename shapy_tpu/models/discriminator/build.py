"""Adversarial pose/shape discriminator.

Reference status: ``regressor/human_shape/models/discriminator/build.py``
is a builder stub and ``models/build.py:26-31`` raises NotImplementedError
when ``use_adv_training`` is set — adversarial training shipped as config
surface only. Here the builder is functional: an HMR-style per-joint +
whole-pose discriminator (one small MLP per joint rotation plus a joint
MLP over all rotations and one over betas), usable with the train step's
optimizer machinery.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from shapy_tpu.models.heads.mlp import mlp_forward, mlp_init

Array = jax.Array


class PoseDiscriminator:
    """HMR-style discriminator over pose rotations (+ betas)."""

    def __init__(self, num_joints: int = 21, num_betas: int = 10,
                 hidden: int = 32, seed: int = 0):
        self.num_joints = num_joints
        self.num_betas = num_betas
        self.hidden = hidden
        rng = np.random.default_rng(seed)
        params: Dict[str, Dict] = {}
        for j in range(num_joints):
            params[f"joint_{j:02d}"] = mlp_init(
                9, 1, (hidden,), gain=1.0, seed=seed + j
            )
        params["all_joints"] = mlp_init(
            num_joints * 9, 1, (hidden * 4, hidden * 4), gain=1.0,
            seed=seed + 100,
        )
        params["shape"] = mlp_init(
            num_betas, 1, (hidden,), gain=1.0, seed=seed + 200
        )
        self.params = params

    def apply(self, params: Dict, rotmats: Array,
              betas: Optional[Array] = None) -> Array:
        """rotmats: (B, J, 3, 3) -> (B, num_joints + 1 [+1]) logits."""
        B = rotmats.shape[0]
        flat = rotmats.reshape(B, self.num_joints, 9)
        outs = [
            mlp_forward(params[f"joint_{j:02d}"], flat[:, j], 1, "relu")
            for j in range(self.num_joints)
        ]
        outs.append(
            mlp_forward(
                params["all_joints"], flat.reshape(B, -1), 2, "relu"
            )
        )
        if betas is not None:
            outs.append(mlp_forward(params["shape"], betas, 1, "relu"))
        return jnp.concatenate(outs, axis=-1)

    def __call__(self, rotmats, betas=None):
        return self.apply(self.params, rotmats, betas)


def build_discriminator(cfg: Optional[Dict] = None) -> PoseDiscriminator:
    cfg = dict(cfg or {})
    return PoseDiscriminator(
        num_joints=int(cfg.get("num_joints", 21)),
        num_betas=int(cfg.get("num_betas", 10)),
        hidden=int(cfg.get("hidden", 32)),
    )

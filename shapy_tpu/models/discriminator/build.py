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


def _spectral_sigma(w2d: Array, u: Array) -> tuple:
    """One power-iteration step: returns (sigma, new_u).

    Matches torch.nn.utils.spectral_norm semantics (weight / sigma with a
    persistent left-singular estimate ``u`` updated each forward)."""
    # torch detaches BOTH power-iteration vectors ("do not backprop
    # through the power iteration"): sigma = u^T W v with u, v constant,
    # so d(sigma)/dW = u v^T only.
    v = w2d.T @ u
    v = jax.lax.stop_gradient(v / (jnp.linalg.norm(v) + 1e-12))
    u_new = w2d @ v
    u_norm = jnp.linalg.norm(u_new) + 1e-12
    u_new = jax.lax.stop_gradient(u_new / u_norm)
    sigma = u_new @ (w2d @ v)
    return sigma, u_new


class HMRDiscriminator:
    """The reference's exact discriminator topology
    (models/discriminator/build.py:45-90): two SHARED per-joint 1x1
    convs 9 -> C -> C (a conv over (B, 9, J, 1) == a joint-shared
    dense), a shared per-joint linear to one logit each, and a
    (J*C -> nzfeat -> nzfeat -> 1) MLP over all joints; every weight
    spectrally normalised. Output (B, J + 1) logits.

    Functional form: ``apply(params, rotmats, train)`` returns
    (logits, new_params_u) — the power-iteration ``u`` vectors update
    like BN stats (persistent buffers in torch)."""

    LAYERS = ("conv1", "conv2", "part_disc", "linear1", "linear2",
              "linear3")

    def __init__(self, num_joints: int = 21, num_channels: int = 32,
                 nzfeat: int = 1024, use_spectral_norm: bool = True,
                 seed: int = 0):
        self.num_joints = num_joints
        self.num_channels = num_channels
        self.nzfeat = nzfeat
        self.use_spectral_norm = use_spectral_norm
        rng = np.random.default_rng(seed)

        def dense(nin, nout):
            # torch Conv2d/Linear default init: kaiming_uniform(a=sqrt(5))
            bound = float(np.sqrt(1.0 / nin))
            return {
                "weight": jnp.asarray(
                    rng.uniform(-bound, bound, (nin, nout)), jnp.float32),
                "bias": jnp.asarray(
                    rng.uniform(-bound, bound, (nout,)), jnp.float32),
                "u": jnp.asarray(rng.normal(size=(nout,)), jnp.float32),
            }

        C, J, Z = num_channels, num_joints, nzfeat
        self.params = {
            "conv1": dense(9, C),
            "conv2": dense(C, C),
            "part_disc": dense(C, 1),
            "linear1": dense(J * C, Z),
            "linear2": dense(Z, Z),
            "linear3": dense(Z, 1),
        }

    def _dense(self, layer: Dict, x: Array, updates: Dict, name: str
               ) -> Array:
        w = layer["weight"]
        if self.use_spectral_norm:
            sigma, u_new = _spectral_sigma(w.T, layer["u"])
            w = w / sigma
            updates[name] = u_new
        return x @ w + layer["bias"]

    def apply(self, params: Dict, rotmats: Array, train: bool = False
              ) -> tuple:
        """rotmats: (B, J, 3, 3) or (B, J, 9) -> ((B, J+1), u_updates)."""
        B = rotmats.shape[0]
        x = rotmats.reshape(B, self.num_joints, 9)
        upd: Dict[str, Array] = {}
        x = jax.nn.relu(self._dense(params["conv1"], x, upd, "conv1"))
        x = jax.nn.relu(self._dense(params["conv2"], x, upd, "conv2"))
        part = self._dense(params["part_disc"], x, upd, "part_disc")
        part = part.reshape(B, self.num_joints)
        flat = x.reshape(B, -1)
        h = jax.nn.relu(
            self._dense(params["linear1"], flat, upd, "linear1"))
        h = jax.nn.relu(self._dense(params["linear2"], h, upd, "linear2"))
        full = self._dense(params["linear3"], h, upd, "linear3")
        logits = jnp.concatenate([part, full], axis=1)
        return logits, upd

    def __call__(self, rotmats, train: bool = False):
        return self.apply(self.params, rotmats, train)[0]


def build_discriminator(cfg: Optional[Dict] = None):
    """'hmr' -> the reference topology (reference build_discriminator,
    models/discriminator/build.py:12-17); 'per-joint' -> the
    independent-MLP variant."""
    cfg = dict(cfg or {})
    disc_type = cfg.get("type", "hmr")
    if disc_type == "hmr":
        return HMRDiscriminator(
            num_joints=int(cfg.get("num_joints", 21)),
            num_channels=int(cfg.get("num_channels", 32)),
            nzfeat=int(cfg.get("nzfeat", 1024)),
            use_spectral_norm=bool(cfg.get("use_spectral_norm", True)),
        )
    if disc_type == "per-joint":
        return PoseDiscriminator(
            num_joints=int(cfg.get("num_joints", 21)),
            num_betas=int(cfg.get("num_betas", 10)),
            hidden=int(cfg.get("hidden", 32)),
        )
    raise ValueError(f"Unknown discriminator type: {disc_type}")

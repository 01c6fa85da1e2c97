"""Adversarial (GAN) losses for discriminator training.

Behavioural spec: reference ``regressor/human_shape/losses/
losses.py:242-332`` (LSGANLoss, WassersteinGANGP) and the
``build_adv_loss`` factory (losses.py:78-90). Functional form: the
discriminator is ``disc_apply(disc_params, x) -> (B, K) scores`` (e.g.
``HMRDiscriminator.apply`` without the u-updates), and each loss exposes

  generator_loss(disc_params, fake)            -> scalar
  discriminator_loss(disc_params, fake, real)  -> (scalar, aux dict)

so generator and discriminator updates are two independent ``jax.grad``
calls — the JAX equivalent of the reference's ``update_gen`` switch.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class LSGANLoss:
    """Least-squares GAN (reference losses.py:242-266): generator drives
    fake scores to 1; discriminator drives real scores to 1 and fake
    scores to 0. Per-sample score vectors are sum-squared over the score
    axis, then batch-meaned, exactly as the reference."""

    def __init__(self, disc_apply: Callable, weight: float = 1.0):
        self.disc_apply = disc_apply
        self.weight = weight

    def generator_loss(self, disc_params, fake: Array) -> Array:
        scores = self.disc_apply(disc_params, fake)
        return jnp.mean(jnp.sum((scores - 1.0) ** 2, axis=1)) * self.weight

    def discriminator_loss(
        self, disc_params, fake: Array, real: Array,
        rng: Optional[Array] = None,
    ) -> Tuple[Array, Dict[str, Array]]:
        # rng accepted (unused) so LSGAN and WGAN-GP share a call shape.
        # One discriminator call on the concatenated batch, like the
        # reference (shared BN-free graph; also halves dispatches).
        scores = self.disc_apply(
            disc_params, jnp.concatenate([fake, real], axis=0)
        )
        fake_scores, real_scores = jnp.split(scores, [fake.shape[0]], axis=0)
        loss_real = jnp.mean(jnp.sum((real_scores - 1.0) ** 2, axis=1))
        loss_fake = jnp.mean(jnp.sum(fake_scores ** 2, axis=1))
        return (loss_real + loss_fake) * self.weight, {
            "real_scores": real_scores,
            "fake_scores": fake_scores,
        }


class WassersteinGANGP:
    """WGAN with gradient penalty (reference losses.py:269-332)."""

    def __init__(self, disc_apply: Callable, weight: float = 1.0,
                 gp_weight: float = 1.0, gamma: float = 1.0):
        self.disc_apply = disc_apply
        self.weight = weight
        self.gp_weight = gp_weight
        self.gamma = gamma

    def generator_loss(self, disc_params, fake: Array) -> Array:
        return -jnp.mean(self.disc_apply(disc_params, fake)) * self.weight

    def _gradient_penalty(self, disc_params, fake: Array, real: Array,
                          rng: Array) -> Array:
        B = real.shape[0]
        tau = jax.random.uniform(
            rng, (B,) + (1,) * (real.ndim - 1), dtype=fake.dtype
        )
        x_tilde = tau * real + (1.0 - tau) * fake

        def disc_sum(x):
            return jnp.sum(self.disc_apply(disc_params, x))

        grads = jax.grad(disc_sum)(x_tilde).reshape(B, -1)
        norms = jnp.linalg.norm(grads, axis=1)
        return jnp.mean((norms - self.gamma) ** 2) / self.gamma ** 2

    def discriminator_loss(
        self, disc_params, fake: Array, real: Array,
        rng: Optional[Array] = None,
    ) -> Tuple[Array, Dict[str, Array]]:
        scores = self.disc_apply(
            disc_params, jnp.concatenate([fake, real], axis=0)
        )
        fake_scores, real_scores = jnp.split(scores, [fake.shape[0]], axis=0)
        loss_fake = jnp.mean(fake_scores)
        loss_real = jnp.mean(real_scores)
        loss = loss_fake - loss_real
        if rng is None:
            # Training MUST thread a fresh rng per step (the reference
            # draws tau.uniform_() each call, losses.py:322-331); a
            # fixed key would pin the Lipschitz penalty to one
            # interpolation point per sample slot for the whole run.
            raise ValueError(
                "WassersteinGANGP.discriminator_loss requires rng")
        gp = self._gradient_penalty(disc_params, fake, real, rng)
        return loss + self.gp_weight * gp, {
            "wasserstein_distance": loss_real - loss_fake,
            "gp": gp,
        }


def build_adv_loss(disc_apply: Callable, disc_cfg: Optional[Dict] = None):
    """Factory mirroring reference build_adv_loss (losses.py:78-90)."""
    cfg = dict(disc_cfg or {})
    adv_type = cfg.get("type", "lsgan")
    weight = float(cfg.get("weight", 1.0))
    if adv_type == "lsgan":
        return LSGANLoss(disc_apply, weight=weight)
    if adv_type == "wgan-gp":
        wgan = dict(cfg.get("wgan_gp") or {})
        return WassersteinGANGP(
            disc_apply, weight=weight,
            gp_weight=float(wgan.get("gp_weight", 1.0)),
            gamma=float(wgan.get("gamma", 1.0)),
        )
    raise ValueError(f"Unknown adversarial loss: {adv_type}")

"""Fit body shape to target measurements.

Behavioural spec: reference ``mesh-mesh-intersection/examples/
fit_measurements.py:49+``: optimise betas so the virtual measurements
(height, chest, waist, hips, optionally mass) match given targets.

TPU-first: the whole objective (forward_shape -> gather triangles ->
differentiable plane-slice + support-hull measurements) is one jitted
loss; optimisation is L-BFGS/Adam via optax instead of the reference's
torch TrustRegion — and because our measurement op is differentiable end
to end (the reference's CUDA op is not), gradients are exact rather than
flowing only through the barycentric recombination.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def fit_betas_to_measurements(
    body_model,
    measurements_module,
    targets: Dict[str, float],
    init_betas: Optional[jnp.ndarray] = None,
    weights: Optional[Dict[str, float]] = None,
    num_steps: int = 200,
    learning_rate: float = 0.05,
    shape_prior_weight: float = 1e-3,
    batch_size: int = 1,
) -> Dict[str, jnp.ndarray]:
    """Returns {'betas', 'measurements', 'losses'}."""
    import optax

    faces = body_model.faces
    num_betas = body_model.num_betas
    if init_betas is None:
        init_betas = jnp.zeros((batch_size, num_betas), jnp.float32)
    if weights is None:
        weights = {k: 1.0 for k in targets}

    target_arrs = {
        k: jnp.full((batch_size,), float(v)) for k, v in targets.items()
    }

    def measure(betas):
        v_shaped = body_model.forward_shape(betas)["v_shaped"]
        meas = measurements_module.forward(
            v_shaped[:, faces])["measurements"]
        return {k: v["tensor"] for k, v in meas.items()}

    def loss_fn(betas):
        meas = measure(betas)
        loss = shape_prior_weight * jnp.sum(betas**2) / batch_size
        for k, target in target_arrs.items():
            loss = loss + weights.get(k, 1.0) * jnp.mean(
                (meas[k] - target) ** 2
            )
        return loss

    tx = optax.adam(learning_rate)
    opt_state = tx.init(init_betas)

    @jax.jit
    def step(betas, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(betas)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(betas, updates), opt_state, loss

    betas = init_betas
    losses = []
    for _ in range(num_steps):
        betas, opt_state, loss = step(betas, opt_state)
        # keep the device scalar: float() here would block on a
        # device->host sync every step and serialise async dispatch
        losses.append(loss)
    return {
        "betas": betas,
        "measurements": measure(betas),
        "losses": np.asarray([float(x) for x in losses]),
    }

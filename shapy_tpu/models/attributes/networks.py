"""Regression network zoo for the attribute models.

Reference: ``attributes/attributes/attributes_betas/models.py`` (MLP /
ResNet1D / mixture-of-experts / linear) and ``polynomial.py``. The shipped
SHAPY checkpoints all use ``polynomial``; the NN variants exist for
capability parity and are implemented in flax.linen.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from shapy_tpu.models.attributes.polynomial import Polynomial

Array = jax.Array


class MLP(nn.Module):
    """Plain MLP with configurable activation and optional dropout."""

    output_dim: int
    hidden_dims: Sequence[int] = (256, 256)
    activation: str = "relu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        act = getattr(nn, self.activation)
        for h in self.hidden_dims:
            x = act(nn.Dense(h)(x))
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.output_dim)(x)


class ResBlock1D(nn.Module):
    width: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.relu(nn.Dense(self.width)(x))
        h = nn.Dense(self.width)(h)
        if x.shape[-1] != self.width:
            x = nn.Dense(self.width)(x)
        return nn.relu(x + h)


class ResNet1D(nn.Module):
    output_dim: int
    width: int = 256
    depth: int = 3

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        for _ in range(self.depth):
            x = ResBlock1D(self.width)(x)
        return nn.Dense(self.output_dim)(x)


class MixtureOfExperts(nn.Module):
    """Soft mixture over expert MLPs with a learned gate."""

    output_dim: int
    num_experts: int = 4
    hidden_dims: Sequence[int] = (128,)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        gate = nn.softmax(nn.Dense(self.num_experts)(x), axis=-1)
        outs = jnp.stack(
            [
                MLP(self.output_dim, self.hidden_dims)(x, train)
                for _ in range(self.num_experts)
            ],
            axis=-1,
        )  # (B, out, E)
        return jnp.einsum("boe,be->bo", outs, gate)


class LinearNet(nn.Module):
    output_dim: int

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        return nn.Dense(self.output_dim)(x)


class FlaxRegressor:
    """Adapter giving flax networks the fit/predict interface the A2B/B2A
    harnesses expect; trains with optax Adam + MSE."""

    def __init__(self, module: nn.Module, input_dim: int, seed: int = 0,
                 learning_rate: float = 1e-3, num_steps: int = 2000,
                 batch_size: int = 256):
        self.module = module
        self.input_dim = input_dim
        self.learning_rate = learning_rate
        self.num_steps = num_steps
        self.batch_size = batch_size
        self.variables = module.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, input_dim))
        )

    def __call__(self, x: Array) -> Array:
        return self.module.apply(self.variables, x)

    def predict(self, x) -> np.ndarray:
        return np.asarray(self(jnp.asarray(np.asarray(x), jnp.float32)))

    def fit(self, X, Y) -> "FlaxRegressor":
        import optax

        X = jnp.asarray(np.asarray(X), jnp.float32)
        Y = jnp.asarray(np.asarray(Y), jnp.float32)
        tx = optax.adam(self.learning_rate)
        opt_state = tx.init(self.variables)

        @jax.jit
        def step(variables, opt_state, key):
            idx = jax.random.randint(
                key, (min(self.batch_size, X.shape[0]),), 0, X.shape[0]
            )

            def loss_fn(v):
                pred = self.module.apply(v, X[idx])
                return jnp.mean((pred - Y[idx]) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(variables)
            updates, opt_state = tx.update(grads, opt_state, variables)
            return optax.apply_updates(variables, updates), opt_state, loss

        key = jax.random.PRNGKey(1)
        v = self.variables
        for i in range(self.num_steps):
            key, sub = jax.random.split(key)
            v, opt_state, _ = step(v, opt_state, sub)
        self.variables = v
        return self


def build_network(
    network_cfg: Optional[Dict[str, Any]],
    input_dim: int,
    output_dim: int,
):
    """Factory mirroring reference ``build_network`` (models.py:582-637)."""
    cfg = dict(network_cfg or {})
    net_type = cfg.get("type", "polynomial")
    if net_type == "polynomial":
        sub = dict(cfg.get("polynomial") or {})
        return Polynomial(
            input_dim,
            output_dim,
            degree=int(sub.get("degree", 2)),
            alpha=float(sub.get("alpha", 0.0)),
        )
    sub = dict(cfg.get(net_type) or {})
    if net_type == "mlp":
        module = MLP(output_dim, tuple(sub.get("hidden_dims", (256, 256))),
                     sub.get("activation", "relu"),
                     float(sub.get("dropout", 0.0)))
    elif net_type == "resnet":
        module = ResNet1D(output_dim, int(sub.get("width", 256)),
                          int(sub.get("depth", 3)))
    elif net_type == "moe":
        module = MixtureOfExperts(output_dim,
                                  int(sub.get("num_experts", 4)),
                                  tuple(sub.get("hidden_dims", (128,))))
    elif net_type in ("linear", "simple"):
        module = LinearNet(output_dim)
    else:
        raise ValueError(f"Unknown network type: {net_type}")
    return FlaxRegressor(
        module,
        input_dim,
        learning_rate=float(sub.get("learning_rate", 1e-3)),
        num_steps=int(sub.get("num_steps", 2000)),
    )

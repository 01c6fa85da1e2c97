"""Functional MLP head with torch-compatible parameter naming.

Behavioural spec: reference ``regressor/human_shape/models/common/
networks.py:308-400`` — blocks of Linear (+ optional activation /
normalisation / dropout) named ``layer_{idx:03d}`` with the Linear at
sequential position 0, followed by ``output_layer`` initialised with
xavier-uniform(gain) (networks.py:378-381). The SHAPY demo config uses
layers=[1024, 1024], activation none, normalization none, dropout 0.5.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def mlp_init(
    input_dim: int,
    output_dim: int,
    layers: Sequence[int] = (1024, 1024),
    gain: float = 0.01,
    seed: int = 0,
    dtype=jnp.float32,
) -> Dict[str, Array]:
    """Kaiming-ish init for hidden linears, xavier-uniform(gain) output."""
    rng = np.random.default_rng(seed)
    params: Dict[str, Array] = {}
    d = input_dim
    for i, width in enumerate(layers):
        bound = 1.0 / np.sqrt(d)
        params[f"layer_{i:03d}.0.weight"] = jnp.asarray(
            rng.uniform(-bound, bound, size=(width, d)), dtype=dtype
        )
        params[f"layer_{i:03d}.0.bias"] = jnp.asarray(
            rng.uniform(-bound, bound, size=(width,)), dtype=dtype
        )
        d = width
    a = gain * np.sqrt(6.0 / (d + output_dim))
    params["output_layer.weight"] = jnp.asarray(
        rng.uniform(-a, a, size=(output_dim, d)), dtype=dtype
    )
    params["output_layer.bias"] = jnp.asarray(
        np.zeros(output_dim), dtype=dtype
    )
    return params


def mlp_forward(
    params: Dict[str, Array],
    x: Array,
    num_layers: int,
    activation: Optional[str] = None,
    dropout: float = 0.0,
    train: bool = False,
    rng: Optional[Array] = None,
) -> Array:
    for i in range(num_layers):
        w = params[f"layer_{i:03d}.0.weight"]
        b = params[f"layer_{i:03d}.0.bias"]
        x = x @ w.T.astype(x.dtype) + b.astype(x.dtype)
        if activation == "relu":
            x = jax.nn.relu(x)
        elif activation == "gelu":
            x = jax.nn.gelu(x)
        if dropout > 0.0 and train:
            assert rng is not None, "dropout in train mode needs an rng"
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout, x.shape)
            x = jnp.where(keep, x / (1.0 - dropout), 0.0)
    w = params["output_layer.weight"]
    b = params["output_layer.bias"]
    return x @ w.T.astype(x.dtype) + b.astype(x.dtype)

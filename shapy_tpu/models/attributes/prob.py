"""Probabilistic A2S heads: attributes -> distribution over betas.

Behavioural spec: reference ``attributes/attributes/attributes_betas/
prob.py:51-460`` (MultiVariateNormalRegressor, conditional affine-coupling
flow via nflows) and ``a2b.py:1206-1434`` (A2BProbabilistic: NLL training,
sampling). Implemented natively in flax/jax — an MVN head with a learned
Cholesky factor, and a conditional RealNVP-style affine coupling flow —
since neither torch nor nflows belongs on the TPU compute path.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class MVNHead(nn.Module):
    """Features -> (mean, Cholesky) of a multivariate normal over betas."""

    out_dim: int
    hidden_dims: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array]:
        for h in self.hidden_dims:
            x = nn.relu(nn.Dense(h)(x))
        mean = nn.Dense(self.out_dim)(x)
        diag = nn.softplus(nn.Dense(self.out_dim)(x)) + 1e-4
        off = nn.Dense(self.out_dim * (self.out_dim - 1) // 2)(x)
        tril = jnp.zeros(x.shape[:-1] + (self.out_dim, self.out_dim))
        idx = jnp.tril_indices(self.out_dim, k=-1)
        tril = tril.at[..., idx[0], idx[1]].set(off)
        tril = tril + jnp.eye(self.out_dim) * diag[..., None, :]
        return mean, tril


def mvn_log_prob(y: Array, mean: Array, tril: Array) -> Array:
    """Log density of N(mean, L L^T) at y, batched."""
    d = y - mean
    z = jax.scipy.linalg.solve_triangular(tril, d[..., None], lower=True)[
        ..., 0
    ]
    logdet = jnp.sum(jnp.log(jnp.diagonal(tril, axis1=-2, axis2=-1)), axis=-1)
    k = y.shape[-1]
    return -0.5 * jnp.sum(z * z, axis=-1) - logdet \
        - 0.5 * k * jnp.log(2 * jnp.pi)


class CouplingLayer(nn.Module):
    """Conditional affine coupling: transform half of y given the other
    half and the conditioning features (reference prob.py:202-285)."""

    dim: int
    cond_dim: int
    hidden: int = 128
    flip: bool = False

    @nn.compact
    def __call__(self, y: Array, cond: Array, inverse: bool = False
                 ) -> Tuple[Array, Array]:
        d1 = self.dim // 2
        a, b = (y[..., :d1], y[..., d1:])
        if self.flip:
            a, b = b, a
        h = jnp.concatenate([a, cond], axis=-1)
        h = nn.relu(nn.Dense(self.hidden)(h))
        h = nn.relu(nn.Dense(self.hidden)(h))
        scale = jnp.tanh(nn.Dense(b.shape[-1])(h)) * 2.0
        shift = nn.Dense(b.shape[-1])(h)
        if inverse:
            b = (b - shift) * jnp.exp(-scale)
            logdet = -jnp.sum(scale, axis=-1)
        else:
            b = b * jnp.exp(scale) + shift
            logdet = jnp.sum(scale, axis=-1)
        if self.flip:
            a, b = b, a
        return jnp.concatenate([a, b], axis=-1), logdet


class ConditionalFlow(nn.Module):
    """Stack of conditional coupling layers over a standard normal base."""

    dim: int
    cond_dim: int
    num_layers: int = 6
    hidden: int = 128

    def setup(self):
        self.layers = [
            CouplingLayer(self.dim, self.cond_dim, self.hidden,
                          flip=bool(i % 2))
            for i in range(self.num_layers)
        ]

    def forward(self, z: Array, cond: Array) -> Tuple[Array, Array]:
        """base -> data."""
        logdet = jnp.zeros(z.shape[:-1])
        for layer in self.layers:
            z, ld = layer(z, cond)
            logdet = logdet + ld
        return z, logdet

    def inverse(self, y: Array, cond: Array) -> Tuple[Array, Array]:
        """data -> base."""
        logdet = jnp.zeros(y.shape[:-1])
        for layer in reversed(self.layers):
            y, ld = layer(y, cond, inverse=True)
            logdet = logdet + ld
        return y, logdet

    def __call__(self, y: Array, cond: Array) -> Array:
        """Log prob of data under the flow."""
        z, logdet = self.inverse(y, cond)
        base = -0.5 * jnp.sum(z * z, axis=-1) \
            - 0.5 * self.dim * jnp.log(2 * jnp.pi)
        return base + logdet


class A2BProbabilistic:
    """Probabilistic attributes->betas regressor (mvn or flow head)."""

    def __init__(self, cfg: Optional[Dict] = None, **kwargs):
        cfg = dict(cfg or {}, **kwargs)
        self.cfg = cfg
        self.betas_size = int(cfg.get("num_shape_comps", 10))
        from shapy_tpu.models.attributes.features import select_features

        self.selected_attr, self.selected_attr_idx, self.selected_mmts = (
            select_features(cfg)
        )
        self.input_dim = len(self.selected_attr) + len(self.selected_mmts)
        prob_cfg = dict(cfg.get("probabilistic") or {})
        self.head_type = prob_cfg.get("type", "mvn")
        if self.head_type == "mvn":
            self.module = MVNHead(
                self.betas_size,
                tuple(prob_cfg.get("hidden_dims", (256, 256))),
            )
        else:
            self.module = ConditionalFlow(
                self.betas_size,
                self.input_dim,
                int(prob_cfg.get("num_layers", 6)),
                int(prob_cfg.get("hidden", 128)),
            )
        self._init_params()

    def _init_params(self, seed: int = 0):
        x = jnp.zeros((1, self.input_dim))
        if self.head_type == "mvn":
            self.variables = self.module.init(jax.random.PRNGKey(seed), x)
        else:
            y = jnp.zeros((1, self.betas_size))
            self.variables = self.module.init(jax.random.PRNGKey(seed), y, x)

    # -- log prob / sampling ----------------------------------------------
    def log_prob(self, betas: Array, features: Array) -> Array:
        head = getattr(self, "head", None)
        if head is not None:  # imported reference checkpoint
            return -head.neg_log_likelihood(features, betas)
        if self.head_type == "mvn":
            mean, tril = self.module.apply(self.variables, features)
            return mvn_log_prob(betas, mean, tril)
        return self.module.apply(self.variables, betas, features)

    def sample(self, features: Array, key, num_samples: int = 1) -> Array:
        head = getattr(self, "head", None)
        if head is not None:  # imported: (B, N, D) -> (N, B, D)
            return jnp.swapaxes(
                head.sample(num_samples, jnp.asarray(features), key), 0, 1)
        B = features.shape[0]
        z = jax.random.normal(key, (num_samples, B, self.betas_size))
        if self.head_type == "mvn":
            mean, tril = self.module.apply(self.variables, features)
            return mean[None] + jnp.einsum("bij,sbj->sbi", tril, z)
        cond = jnp.broadcast_to(features, (num_samples,) + features.shape)
        y, _ = self.module.apply(
            self.variables, z.reshape(-1, self.betas_size),
            cond.reshape(-1, self.input_dim), method=self.module.forward,
        )
        return y.reshape(num_samples, B, self.betas_size)

    def predict(self, features) -> np.ndarray:
        """Point estimate: the MVN mean / flow forward of z=0."""
        head = getattr(self, "head", None)
        if head is not None:
            return head.predict(features)
        features = jnp.asarray(np.asarray(features), jnp.float32)
        if self.head_type == "mvn":
            mean, _ = self.module.apply(self.variables, features)
            return np.asarray(mean)
        z = jnp.zeros((features.shape[0], self.betas_size))
        y, _ = self.module.apply(
            self.variables, z, features, method=self.module.forward
        )
        return np.asarray(y)

    # -- training ----------------------------------------------------------
    def fit(self, features, betas, num_steps: int = 2000,
            learning_rate: float = 1e-3, batch_size: int = 256,
            seed: int = 0) -> "A2BProbabilistic":
        """Maximum-likelihood training (reference trains NLL,
        a2b.py:1206-1434)."""
        import optax

        X = jnp.asarray(np.asarray(features), jnp.float32)
        Y = jnp.asarray(np.asarray(betas), jnp.float32)[:, : self.betas_size]
        tx = optax.adam(learning_rate)
        opt_state = tx.init(self.variables)

        def nll(variables, xb, yb):
            if self.head_type == "mvn":
                mean, tril = self.module.apply(variables, xb)
                return -jnp.mean(mvn_log_prob(yb, mean, tril))
            return -jnp.mean(self.module.apply(variables, yb, xb))

        @jax.jit
        def step(variables, opt_state, key):
            idx = jax.random.randint(
                key, (min(batch_size, X.shape[0]),), 0, X.shape[0]
            )
            loss, grads = jax.value_and_grad(nll)(variables, X[idx], Y[idx])
            updates, opt_state = tx.update(grads, opt_state, variables)
            return optax.apply_updates(variables, updates), opt_state, loss

        key = jax.random.PRNGKey(seed)
        v = self.variables
        for _ in range(num_steps):
            key, sub = jax.random.split(key)
            v, opt_state, _ = step(v, opt_state, sub)
        self.variables = v
        return self

    # -- reference checkpoint import ----------------------------------------
    @classmethod
    def load_from_checkpoint(cls, path: str,
                             cfg: Optional[Dict] = None
                             ) -> "A2BProbabilistic":
        """Load a reference-trained A2BProbabilistic Lightning checkpoint
        (reference demo.py:54). The torch parametrisation (MVN with
        diagonal/tril Cholesky over a zoo network, or the nflows
        ActNorm/LULinear/conditional-coupling flow) differs from the
        native flax heads, so the imported model runs on the
        reference-architecture twins in
        :mod:`shapy_tpu.models.attributes.prob_import`; log_prob /
        sample / predict keep this class's interface."""
        from shapy_tpu.models.attributes.prob_import import (
            probabilistic_from_checkpoint,
        )

        head, conf = probabilistic_from_checkpoint(path, cfg)
        obj = cls.__new__(cls)
        obj.cfg = conf
        obj.betas_size = head.distr_dim
        from shapy_tpu.models.attributes.features import select_features

        obj.selected_attr, obj.selected_attr_idx, obj.selected_mmts = (
            select_features(conf)
        )
        obj.input_dim = len(obj.selected_attr) + len(obj.selected_mmts)
        obj.head_type = ("mvn-torch" if hasattr(head, "mean_L")
                         else "flow-torch")
        obj.module = None
        obj.variables = None
        obj.head = head
        return obj

    def neg_log_likelihood(self, features: Array, betas: Array) -> Array:
        """Reference-head NLL (imported checkpoints); the native heads
        expose ``log_prob`` instead."""
        head = getattr(self, "head", None)
        if head is not None:
            return head.neg_log_likelihood(features, betas)
        return -self.log_prob(betas, features)

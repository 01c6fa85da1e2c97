"""Polynomial regression head (the shipped S2A / A2S model type).

Behavioural spec: reference ``attributes/attributes/attributes_betas/
polynomial.py:21-141`` — degree-d polynomial feature expansion
(all ``combinations_with_replacement`` of input indices, sizes 1..d, no
bias column) followed by a linear layer, with an sklearn-equivalent ridge
fit whose coefficients are baked into the linear layer.

TPU design: the expansion index table is static, so inference is one
gather-product plus one matmul — trivially jitted and batched. The fit is
a closed-form ridge solve (normal equations on the host), which matches
``sklearn.linear_model.Ridge(alpha, fit_intercept=False)`` applied to
``PolynomialFeatures(degree)`` (reference polynomial.py:71-88): the
constant PolynomialFeatures column plays the role of the (unpenalised in
sklearn? no — penalised, since fit_intercept=False) intercept, and its
coefficient becomes the bias.
"""

from __future__ import annotations

from itertools import chain, combinations_with_replacement
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def polynomial_combinations(
    n_features: int, degree: int
) -> Tuple[Tuple[int, ...], ...]:
    """All index tuples of sizes 1..degree (reference polynomial.py:55-58,
    ``include_bias=False, interaction_only=False``)."""
    return tuple(
        chain.from_iterable(
            combinations_with_replacement(range(n_features), i)
            for i in range(1, degree + 1)
        )
    )


class Polynomial:
    """Feature expansion + linear map; parameters are a small pytree."""

    def __init__(
        self,
        input_dim: int,
        output_dim: int,
        degree: int = 2,
        alpha: float = 0.0,
        weight: Optional[np.ndarray] = None,
        bias: Optional[np.ndarray] = None,
        dtype=jnp.float32,
    ):
        self.input_dim = int(input_dim)
        self.output_dim = int(output_dim)
        self.degree = int(degree)
        self.alpha = float(alpha)
        self.dtype = dtype

        combos = polynomial_combinations(self.input_dim, self.degree)
        self.coeff_size = len(combos)
        # Static per-degree index tables: features of size k are a k-way
        # product gathered with one (num_k, k) index array.
        self._index_tables = []
        for k in range(1, self.degree + 1):
            idx = np.asarray(
                [c for c in combos if len(c) == k], dtype=np.int32
            )
            self._index_tables.append(idx)

        if weight is None:
            weight = np.zeros((self.output_dim, self.coeff_size))
        if bias is None:
            bias = np.zeros((self.output_dim,))
        self.params: Dict[str, Array] = {
            "weight": jnp.asarray(weight, dtype=dtype),
            "bias": jnp.asarray(bias, dtype=dtype),
        }

    # -- feature expansion --------------------------------------------------
    def expand(self, x: Array) -> Array:
        """(B, n) -> (B, coeff_size) polynomial features."""
        feats = []
        for idx in self._index_tables:
            feats.append(jnp.prod(x[:, idx], axis=-1))
        return jnp.concatenate(feats, axis=-1)

    def expand_np(self, x: np.ndarray) -> np.ndarray:
        feats = [np.prod(x[:, idx], axis=-1) for idx in self._index_tables]
        return np.concatenate(feats, axis=-1)

    # -- inference ----------------------------------------------------------
    def __call__(self, x: Array, params: Optional[Dict] = None) -> Array:
        p = self.params if params is None else params
        return self.expand(x.astype(self.dtype)) @ p["weight"].T + p["bias"]

    def predict(self, x) -> np.ndarray:
        return np.asarray(self(jnp.asarray(np.asarray(x), dtype=self.dtype)))

    # -- fitting ------------------------------------------------------------
    def fit(self, X: np.ndarray, Y: np.ndarray) -> "Polynomial":
        """Closed-form ridge on [1, poly(X)] with the alpha penalty applied
        to every column (sklearn ``Ridge(fit_intercept=False)`` semantics,
        reference polynomial.py:71-88)."""
        X = np.asarray(X, dtype=np.float64)
        Y = np.asarray(Y, dtype=np.float64)
        if Y.ndim == 1:
            Y = Y[:, None]
        A = np.concatenate(
            [np.ones((X.shape[0], 1)), self.expand_np(X)], axis=1
        )
        AtA = A.T @ A + self.alpha * np.eye(A.shape[1])
        coef = np.linalg.solve(AtA, A.T @ Y)  # (1 + coeff_size, out)
        self.params = {
            "weight": jnp.asarray(coef[1:].T, dtype=self.dtype),
            "bias": jnp.asarray(coef[0], dtype=self.dtype),
        }
        return self

    # -- checkpoint I/O -----------------------------------------------------
    def save_checkpoint(self, path: str) -> None:
        np.savez(
            path,
            weight=np.asarray(self.params["weight"]),
            bias=np.asarray(self.params["bias"]),
            input_dim=self.input_dim,
            output_dim=self.output_dim,
            degree=self.degree,
            alpha=self.alpha,
        )

    @classmethod
    def load_checkpoint(cls, path: str) -> "Polynomial":
        """Load either our npz format or the reference's torch checkpoint
        (``{'model': state_dict, 'hparams': {...}}``, polynomial.py:93-121)."""
        if str(path).endswith(".npz"):
            with np.load(path) as d:
                return cls(
                    int(d["input_dim"]),
                    int(d["output_dim"]),
                    int(d["degree"]),
                    float(d["alpha"]),
                    weight=d["weight"],
                    bias=d["bias"],
                )
        from shapy_tpu.io.torch_import import load_torch_file

        ckpt = load_torch_file(path)
        hparams = ckpt["hparams"]
        sd = ckpt["model"]
        return cls(
            int(hparams["input_dim"]),
            int(hparams["output_dim"]),
            int(hparams.get("degree", 2)),
            float(hparams.get("alpha", 0.0)),
            weight=np.asarray(sd["linear.weight"]),
            bias=np.asarray(sd["linear.bias"]),
        )

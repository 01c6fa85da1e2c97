"""Reference-architecture probabilistic heads + torch-checkpoint import.

The reference's ``A2BProbabilistic`` wraps one of two heads built by
``build_distr_regressor`` (``attributes_betas/prob.py:421-437``):

  * ``MultiVariateNormalRegressor`` — a zoo network mapping features to
    ``[mean, cov-elements]``, with a diagonal (softplus) or free-tril
    Cholesky factor (prob.py:51-199);
  * ``FlowRegressor`` — nflows blocks [ActNorm, LULinear, conditional
    affine coupling] × num_blocks over a standard normal
    (prob.py:287-419). The coupling is the reference's OWN class
    (prob.py:202-284) including its quirk of transforming the FIRST half
    of the vector while also passing it through (prob.py:252-253), and
    of conditioning only on the context, never on the other half.

This module re-implements both heads in jax with the exact same
parametrisation so a reference-trained Lightning checkpoint — which the
native :class:`~shapy_tpu.models.attributes.prob.A2BProbabilistic`
cannot represent — imports losslessly (``load_from_checkpoint`` in
``prob.py``). The native flax heads remain the TPU-first training path;
these exist for checkpoint carry-over.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from shapy_tpu.models.attributes.ckpt_import import import_network
from shapy_tpu.models.attributes.networks import build_network

Array = jax.Array


def _np(t) -> np.ndarray:
    return np.asarray(t, np.float32)


class RefMVNRegressor:
    """Importable twin of ``MultiVariateNormalRegressor``.

    ``net(cond)`` emits ``distr_dim`` means followed by the Cholesky
    elements: softplus'd diagonal for ``covariance='diagonal'``, raw
    ``tril_indices``-ordered entries for ``'tril'`` (prob.py:74-109)."""

    def __init__(self, input_dim: int, distr_dim: int,
                 cfg: Optional[Dict] = None):
        cfg = dict(cfg or {})
        prob_cfg = dict(cfg.get("probabilistic") or {})
        gauss = dict(prob_cfg.get("gaussian") or {})
        self.covariance_type = gauss.get("covariance", "diagonal")
        self.distr_dim = int(distr_dim)
        if self.covariance_type == "diagonal":
            out = 2 * self.distr_dim
            rows = cols = np.arange(self.distr_dim)
        elif self.covariance_type == "tril":
            out = self.distr_dim + self.distr_dim * (
                self.distr_dim + 1) // 2
            rows, cols = np.tril_indices(self.distr_dim)
        else:
            raise ValueError(
                f"Unknown covariance type: {self.covariance_type}")
        self.rows, self.cols = rows, cols
        self.net = build_network(dict(cfg.get("network") or {}),
                                 int(input_dim), out)

    def mean_L(self, cond: Array) -> Tuple[Array, Array]:
        t = jnp.asarray(self.net.predict(cond))
        mean = t[:, : self.distr_dim]
        elems = t[:, self.distr_dim:]
        if self.covariance_type == "diagonal":
            elems = jax.nn.softplus(elems)
        L = jnp.zeros((t.shape[0], self.distr_dim, self.distr_dim))
        L = L.at[:, self.rows, self.cols].set(elems)
        return mean, L

    def neg_log_likelihood(self, cond: Array, values: Array) -> Array:
        """prob.py:157-186 — note the reference's own formula uses
        ``L⁻ᵀL⁻¹`` as precision and ``2·log(Σdiag)``; replicated
        verbatim (including the log-of-SUM-of-diagonal quirk at
        prob.py:180, which differs from the true logdet Σlog(diag))."""
        mean, L = self.mean_L(cond)
        inv_L = jnp.linalg.inv(L)
        L_diag = jnp.diagonal(L, axis1=1, axis2=2)
        diff = jnp.asarray(values) - mean
        prec = jnp.matmul(jnp.swapaxes(inv_L, 1, 2), inv_L)
        return 0.5 * (
            self.distr_dim * math.log(2 * math.pi)
            + 2 * jnp.log(L_diag.sum(axis=-1))
            + (diff * jnp.einsum("bmn,bn->bm", prec, diff)).sum(axis=-1)
        )

    def sample(self, N: int, cond: Array, key) -> Array:
        mean, L = self.mean_L(cond)
        B = mean.shape[0]
        z = jax.random.normal(key, (B, N, self.distr_dim))
        return mean[:, None] + jnp.einsum("bmn,bsn->bsm", L, z)

    def predict(self, cond) -> np.ndarray:
        mean, _ = self.mean_L(jnp.asarray(np.asarray(cond), jnp.float32))
        return np.asarray(mean)

    def import_torch(self, sd: Dict, prefix: str) -> "RefMVNRegressor":
        import_network(self.net, sd, prefix + "net.")
        return self


# -- nflows-compatible flow blocks ------------------------------------------


class _ActNorm:
    """nflows transforms.normalization.ActNorm (eval mode)."""

    def __init__(self, log_scale: np.ndarray, shift: np.ndarray):
        self.log_scale = jnp.asarray(log_scale)
        self.shift = jnp.asarray(shift)

    def forward(self, x, cond):
        out = jnp.exp(self.log_scale) * x + self.shift
        return out, jnp.sum(self.log_scale) * jnp.ones(x.shape[0])

    def inverse(self, x, cond):
        out = (x - self.shift) * jnp.exp(-self.log_scale)
        return out, -jnp.sum(self.log_scale) * jnp.ones(x.shape[0])


class _LULinear:
    """nflows transforms.lu.LULinear: y = L(Ux) + b with unit-diag L and
    softplus(+eps) U diagonal."""

    def __init__(self, lower_entries, upper_entries,
                 unconstrained_upper_diag, bias, eps: float = 1e-3):
        D = len(bias)
        lower = np.zeros((D, D), np.float32)
        lower[np.tril_indices(D, k=-1)] = _np(lower_entries)
        lower[np.diag_indices(D)] = 1.0
        upper = np.zeros((D, D), np.float32)
        upper[np.triu_indices(D, k=1)] = _np(upper_entries)
        diag = np.log1p(np.exp(_np(unconstrained_upper_diag))) + eps
        upper[np.diag_indices(D)] = diag
        self.lower = jnp.asarray(lower)
        self.upper = jnp.asarray(upper)
        self.bias = jnp.asarray(_np(bias))
        self.logdet = float(np.sum(np.log(diag)))

    def forward(self, x, cond):
        out = x @ self.upper.T @ self.lower.T + self.bias
        return out, self.logdet * jnp.ones(x.shape[0])

    def inverse(self, x, cond):
        t = (x - self.bias).T
        t = jax.scipy.linalg.solve_triangular(
            self.lower, t, lower=True, unit_diagonal=True)
        t = jax.scipy.linalg.solve_triangular(self.upper, t, lower=False)
        return t.T, -self.logdet * jnp.ones(x.shape[0])


class _ConditionalCoupling:
    """The reference's ConditionalAffineCoupling (prob.py:202-284),
    quirks preserved: parameters come from the CONTEXT only, and both
    the passthrough half and the transformed half read
    ``x[:, :dim]`` (prob.py:252-253)."""

    def __init__(self, net, dim: int, scale: bool):
        self.net = net
        self.dim = dim
        self.scale = scale

    def _params(self, cond):
        p = jnp.asarray(self.net.predict(cond))
        transl = p[:, : self.dim]
        if self.scale:
            s = jax.nn.softplus(p[:, self.dim:])
        else:
            s = jnp.ones_like(transl)
        return transl, s

    def forward(self, x, cond):
        transl, s = self._params(cond)
        top = x[:, : self.dim]
        bottom = x[:, : self.dim]  # reference quirk (prob.py:253)
        out = jnp.concatenate([top, s * bottom + transl], axis=1)
        return out, jnp.sum(jnp.log(s), axis=1)

    def inverse(self, x, cond):
        transl, s = self._params(cond)
        top = x[:, : self.dim]
        bottom = x[:, : self.dim]
        out = jnp.concatenate([top, (bottom - transl) / s], axis=1)
        return out, -jnp.sum(jnp.log(s), axis=1)


class RefFlowRegressor:
    """Importable twin of the reference FlowRegressor
    (prob.py:287-419): data -> noise through [ActNorm, LULinear,
    coupling] × num_blocks, standard-normal base."""

    def __init__(self, input_dim: int, distr_dim: int,
                 cfg: Optional[Dict] = None):
        cfg = dict(cfg or {})
        prob_cfg = dict(cfg.get("probabilistic") or {})
        flow_cfg = dict(prob_cfg.get("flow") or {})
        self.distr_dim = int(distr_dim)
        self.input_dim = int(input_dim)
        self.num_blocks = int(flow_cfg.get("num_blocks", 4))
        norm_type = flow_cfg.get("norm_type", "actnorm")
        perm_type = flow_cfg.get("perm_type", "lu-linear")
        coupling_type = flow_cfg.get("coupling_type", "lulinear")
        if norm_type != "actnorm" or perm_type != "lu-linear":
            raise ValueError(
                "only actnorm + lu-linear flow blocks are importable "
                f"(got norm={norm_type}, perm={perm_type})"
            )
        self.coupling_scale = coupling_type != "conditional-additive"
        self.network_cfg = dict(cfg.get("network") or {})
        self.blocks = []  # populated by import_torch

    def _coupling_net(self):
        half = self.distr_dim // 2
        out = half + (half if self.coupling_scale else 0)
        return build_network(self.network_cfg, self.input_dim, out)

    def import_torch(self, sd: Dict, prefix: str) -> "RefFlowRegressor":
        base = prefix + "flow._transform._transforms."
        self.blocks = []
        for b in range(self.num_blocks):
            i = 3 * b
            self.blocks.append(_ActNorm(
                _np(sd[f"{base}{i}.log_scale"]),
                _np(sd[f"{base}{i}.shift"]),
            ))
            self.blocks.append(_LULinear(
                sd[f"{base}{i + 1}.lower_entries"],
                sd[f"{base}{i + 1}.upper_entries"],
                sd[f"{base}{i + 1}.unconstrained_upper_diag"],
                sd[f"{base}{i + 1}.bias"],
            ))
            net = self._coupling_net()
            import_network(net, sd, f"{base}{i + 2}.network.")
            self.blocks.append(_ConditionalCoupling(
                net, self.distr_dim // 2, self.coupling_scale))
        return self

    # data -> noise (nflows forward convention)
    def _transform(self, values, cond):
        total = jnp.zeros(values.shape[0])
        x = jnp.asarray(values)
        for blk in self.blocks:
            x, ld = blk.forward(x, cond)
            total = total + ld
        return x, total

    def _inverse(self, noise, cond):
        total = jnp.zeros(noise.shape[0])
        x = jnp.asarray(noise)
        for blk in reversed(self.blocks):
            x, ld = blk.inverse(x, cond)
            total = total + ld
        return x, total

    def neg_log_likelihood(self, cond: Array, values: Array) -> Array:
        noise, logabsdet = self._transform(values, cond)
        log_prob = (-0.5 * jnp.sum(noise ** 2, axis=1)
                    - 0.5 * self.distr_dim * math.log(2 * math.pi))
        return -(log_prob + logabsdet)

    def predict(self, cond) -> np.ndarray:
        """The reference's point estimate: inverse-transform z=0
        (prob.py:399-410)."""
        cond = jnp.asarray(np.asarray(cond), jnp.float32)
        zeros = jnp.zeros((cond.shape[0], self.distr_dim))
        mean, _ = self._inverse(zeros, cond)
        return np.asarray(mean)

    def sample(self, N: int, cond: Array, key) -> Array:
        cond = jnp.asarray(cond)
        B = cond.shape[0]
        z = jax.random.normal(key, (B * N, self.distr_dim))
        rep = jnp.repeat(cond, N, axis=0)
        samples, _ = self._inverse(z, rep)
        return samples.reshape(B, N, self.distr_dim)


def build_distr_regressor(cfg: Dict, input_dim: int, distr_dim: int):
    """prob.py:421-437."""
    prob_type = dict(cfg.get("probabilistic") or {}).get(
        "type", "gaussian")
    if prob_type in ("gaussian", "multivariate-normal"):
        return RefMVNRegressor(input_dim, distr_dim, cfg)
    if prob_type == "flow":
        return RefFlowRegressor(input_dim, distr_dim, cfg)
    raise ValueError(f"Unknown distribution predictor type: {prob_type}")


def probabilistic_from_checkpoint(path: str, cfg: Optional[Dict] = None):
    """Load a reference A2BProbabilistic Lightning checkpoint into the
    importable twin head (reference surface: demo.py:54 via
    MODEL_DICT['a2b-prob']); returns (head, merged_cfg)."""
    from shapy_tpu.io.torch_import import load_torch_file
    from shapy_tpu.models.attributes.features import select_features

    ckpt = load_torch_file(path)
    hp = ckpt.get("hyper_parameters", {})
    conf = dict(hp.get("cfg", {}) if isinstance(hp, dict) else {})
    if cfg:
        conf.update(cfg)
    attrs, _, mmts = select_features(conf)
    input_dim = len(attrs) + len(mmts)
    distr_dim = int(conf.get("num_shape_comps", 10))
    head = build_distr_regressor(conf, input_dim, distr_dim)
    sd = ckpt.get("state_dict", ckpt.get("model", {}))
    head.import_torch(sd, "a2b.")
    return head, conf

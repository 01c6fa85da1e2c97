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


def activ_name(cfg) -> str:
    """Normalise the reference's activation cfg ({'type': 'relu'} /
    'leaky-relu' / ...) to a flax.linen attribute name."""
    if isinstance(cfg, dict):
        cfg = cfg.get("type", "relu")
    name = str(cfg or "relu").replace("-", "_")
    return {"lrelu": "leaky_relu", "none": "linear"}.get(name, name)


class MLP(nn.Module):
    """Plain MLP with configurable activation and optional dropout.
    'prelu' creates one learnable slope per layer, like the reference's
    per-FCNormActiv ``nn.PReLU`` (models.py:37-39, 77-112)."""

    output_dim: int
    hidden_dims: Sequence[int] = (256, 256)
    activation: str = "relu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        prelu = self.activation == "prelu"
        act = None if prelu else _activation_fn(self.activation)
        for i, h in enumerate(self.hidden_dims):
            x = nn.Dense(h)(x)
            if prelu:
                a = self.param(f"prelu_{i}",
                               nn.initializers.constant(0.25), (1,))
                x = _prelu(x, a)
            else:
                x = act(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.output_dim)(x)


def _activation_fn(name: str):
    """Activation by normalised name ('relu'/'leaky_relu'/'elu'/...;
    'none'/'linear' -> identity). torch and jax defaults agree
    (LeakyReLU slope 0.01, ELU alpha 1.0), so imported checkpoints keep
    eval-mode parity. 'prelu' is learnable and handled inside the
    modules that own its slope parameter."""
    if name in ("none", "linear"):
        return lambda v: v
    if name == "prelu":
        raise ValueError(
            "prelu needs a slope parameter; only MLP/ResNet1D (and the "
            "MoE variants built on them) support it"
        )
    return getattr(nn, name)


def _prelu(x: Array, a: Array) -> Array:
    """torch ``nn.PReLU`` semantics: slope broadcasts over the batch
    ((1,) shared, or (C,) per-feature)."""
    return jnp.where(x >= 0, x, a * x)


class ResBlock1D(nn.Module):
    """Reference BasicBlock (models.py:163-221): two linears with the
    activation BEFORE the residual add, a linear ``downsample`` when the
    dims change, and no activation after the add. Normalization layers
    are folded into the linears at checkpoint import (ckpt_import.py),
    so the flax module carries plain Dense layers."""

    width: int
    activation: str = "relu"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.activation == "prelu":
            # the reference BasicBlock applies ONE shared nn.PReLU
            # (self.act) after both linears (models.py:180,203-213)
            aw = self.param("act_weight",
                            nn.initializers.constant(0.25), (1,))
            act = lambda v: _prelu(v, aw)  # noqa: E731
        else:
            act = _activation_fn(self.activation)
        h = act(nn.Dense(self.width, name="linear1")(x))
        h = act(nn.Dense(self.width, name="linear2")(h))
        if x.shape[-1] != self.width:
            x = nn.Dense(self.width, name="downsample")(x)
        return x + h


class ResNet1D(nn.Module):
    """Reference ResNet (models.py:224-262): optional FCNormActiv
    projection to ``layers[0]``, one BasicBlock per entry of ``layers``
    (hidden size = the block's output size), and a final linear. The
    activation cfg reaches the projection and every block, like the
    reference's ``build_activation`` plumbing (models.py:23-46)."""

    output_dim: int
    layers: Sequence[int] = (256, 256)
    proj_layer: bool = True
    activation: str = "relu"

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if self.proj_layer:
            x = nn.Dense(self.layers[0], name="projection")(x)
            if self.activation == "prelu":
                a = self.param("projection_prelu",
                               nn.initializers.constant(0.25), (1,))
                x = _prelu(x, a)
            else:
                x = _activation_fn(self.activation)(x)
        for i, width in enumerate(self.layers):
            x = ResBlock1D(width, self.activation, name=f"block_{i}")(x)
        return nn.Dense(self.output_dim, name="final")(x)


class MixtureOfExperts(nn.Module):
    """Soft mixture over expert networks with a learned gate (reference
    models.py:264-307): the gate is a FULL inner network of the same
    config as the experts (not a single linear), softmaxed over
    experts."""

    output_dim: int
    num_experts: int = 4
    hidden_dims: Sequence[int] = (128,)
    activation: str = "relu"

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        gate = nn.softmax(
            MLP(self.num_experts, tuple(self.hidden_dims),
                self.activation, name="gating")(x, train),
            axis=-1,
        )
        outs = jnp.stack(
            [
                MLP(self.output_dim, tuple(self.hidden_dims),
                    self.activation, name=f"expert_{ii}")(x, train)
                for ii in range(self.num_experts)
            ],
            axis=-1,
        )  # (B, out, E)
        return jnp.einsum("boe,be->bo", outs, gate)


class LinearNet(nn.Module):
    output_dim: int

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        return nn.Dense(self.output_dim)(x)


class SimpleNet(nn.Module):
    """Reference 'simple' network (models.py:611-624): a 3-linear ReLU
    stack whose hidden sizes interpolate input -> output in thirds."""

    input_dim: int
    output_dim: int

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        l1 = int(self.input_dim - (self.input_dim - self.output_dim) / 3)
        l2 = int(self.input_dim - 2 * (self.input_dim - self.output_dim) / 3)
        x = nn.relu(nn.Dense(l1)(x))
        x = nn.relu(nn.Dense(l2)(x))
        return nn.Dense(self.output_dim)(x)


class MixtureOfInputExperts(nn.Module):
    """Per-input-feature experts with a learned softmax gate
    (reference models.py:309-351): one expert network per INPUT
    dimension, each seeing only its own scalar feature; the gate maps
    the full input to per-expert weights.

    The nested expert/gating network follows the reference's recursive
    build_network: 'mlp' (layer sizes) or 'linear'."""

    output_dim: int
    expert_type: str = "mlp"
    expert_layers: Sequence[int] = (64,)
    activation: str = "relu"

    def _make(self, out_dim: int, name: str) -> nn.Module:
        if self.expert_type == "linear":
            return LinearNet(out_dim, name=name)
        return MLP(out_dim, tuple(self.expert_layers), self.activation,
                   name=name)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        D = x.shape[-1]
        gate = nn.softmax(self._make(D, "gating")(x), axis=-1)
        outs = jnp.stack(
            [
                self._make(self.output_dim, f"expert_{ii}")(x[:, ii:ii + 1])
                for ii in range(D)
            ],
            axis=1,
        )  # (B, D, out)
        return jnp.sum(gate[..., None] * outs, axis=1)


class MultiLayerRNNCell(nn.Module):
    """GRU/LSTM cell stack with torch parameter layout
    (reference models.py:355-477). Parameters per layer are the torch
    ``weight_ih/weight_hh/bias_ih/bias_hh`` stacks (gate order GRU:
    r, z, n; LSTM: i, f, g, o) so torch checkpoints import directly and
    random-weight parity against the reference class is exact.

    The reference's forward feeds the RAW input to every layer and
    in-place-mutates LSTM state tuples — both crash for >1 layer or
    LSTM+dropout (models.py:455-469); this implements the docstring
    semantics (each layer consumes its parent's hidden state, dropout
    applied between layers), which coincides with the reference on the
    configurations that actually run (single-layer, GRU-with-dropout).
    """

    output_dim: int
    hidden_dims: Sequence[int] = (1024,)
    cell_type: str = "lstm"
    dropout: float = 0.0
    learn_state: bool = False

    @nn.compact
    def __call__(self, x: Array, state=None, train: bool = False):
        lstm = self.cell_type == "lstm"
        G = 4 if lstm else 3
        B = x.shape[0]
        num_states = 2 if lstm else 1
        new_state = []
        inp = x
        for li, H in enumerate(self.hidden_dims):
            k = 1.0 / np.sqrt(H)
            u = nn.initializers.uniform(scale=2 * k)

            def init(key, shape, _u=u, _k=k):
                return _u(key, shape) - _k

            w_ih = self.param(f"weight_ih_l{li}", init,
                              (G * H, inp.shape[-1]))
            w_hh = self.param(f"weight_hh_l{li}", init, (G * H, H))
            b_ih = self.param(f"bias_ih_l{li}", init, (G * H,))
            b_hh = self.param(f"bias_hh_l{li}", init, (G * H,))
            if state is None:
                if self.learn_state:
                    init_states = [
                        self.param(f"state{n:02d}_l{li}",
                                   nn.initializers.zeros, (1, H))
                        for n in range(num_states)
                    ]
                else:
                    init_states = [jnp.zeros((1, H), x.dtype)
                                   for _ in range(num_states)]
                layer_state = [jnp.broadcast_to(s, (B, H))
                               for s in init_states]
            else:
                layer_state = list(state[li])
            gi = inp @ w_ih.T + b_ih
            gh = layer_state[0] @ w_hh.T + b_hh
            if lstm:
                h, c = layer_state
                i_g, f_g, g_g, o_g = jnp.split(gi + gh, 4, axis=-1)
                c_new = (jax.nn.sigmoid(f_g) * c
                         + jax.nn.sigmoid(i_g) * jnp.tanh(g_g))
                h_new = jax.nn.sigmoid(o_g) * jnp.tanh(c_new)
                new_state.append((h_new, c_new))
            else:
                r_i, z_i, n_i = jnp.split(gi, 3, axis=-1)
                r_h, z_h, n_h = jnp.split(gh, 3, axis=-1)
                r = jax.nn.sigmoid(r_i + r_h)
                z = jax.nn.sigmoid(z_i + z_h)
                n = jnp.tanh(n_i + r * n_h)
                h_new = (1.0 - z) * n + z * layer_state[0]
                new_state.append((h_new,))
            inp = h_new
            if self.dropout > 0:
                inp = nn.Dropout(self.dropout,
                                 deterministic=not train)(inp)
        # Output projection reads the last hidden pre-dropout
        # (models.py:470-475 appends the state before dropout).
        out = nn.Dense(self.output_dim, name="output")(h_new)
        return out, tuple(new_state)


class IterativeRegressorRNN(nn.Module):
    """HMR-style iterative refinement with a recurrent regressor
    (reference models.py:478-539 'iterative'). Faithful to the reference
    forward: the regressor input is [features (+ param_mean)] at EVERY
    stage (the mean is never replaced by the running estimate,
    models.py:516-535); only the RNN state evolves across stages, and
    the deltas accumulate onto the mean."""

    output_dim: int
    hidden_dims: Sequence[int] = (1024,)
    cell_type: str = "lstm"
    dropout: float = 0.0
    learn_state: bool = False
    append_params: bool = True
    num_stages: int = 3

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        B = x.shape[0]
        # buffer in the reference (zeros unless a mean is supplied)
        mean = self.variable(
            "buffers", "param_mean",
            lambda: jnp.zeros((self.output_dim,), jnp.float32),
        ).value
        cond = jnp.broadcast_to(mean[None], (B, self.output_dim))
        reg_input = (jnp.concatenate([x, cond], axis=-1)
                     if self.append_params else x)
        rnn = MultiLayerRNNCell(
            self.output_dim, tuple(self.hidden_dims), self.cell_type,
            self.dropout, self.learn_state, name="regressor",
        )
        deltas, state = rnn(reg_input, None, train)
        params = cond + deltas
        for _ in range(1, self.num_stages):
            deltas, state = rnn(reg_input, state, train)
            params = params + deltas
        return params


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
        # Train only the 'params' collection — 'buffers' (e.g. the
        # iterative regressor's param_mean) stay fixed, matching the
        # reference's register_buffer semantics.
        buffers = {k: v for k, v in self.variables.items() if k != "params"}
        params = self.variables["params"]
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, key):
            idx = jax.random.randint(
                key, (min(self.batch_size, X.shape[0]),), 0, X.shape[0]
            )

            def loss_fn(p):
                pred = self.module.apply({"params": p, **buffers}, X[idx])
                return jnp.mean((pred - Y[idx]) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        key = jax.random.PRNGKey(1)
        p = params
        for i in range(self.num_steps):
            key, sub = jax.random.split(key)
            p, opt_state, _ = step(p, opt_state, sub)
        self.variables = {"params": p, **buffers}
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
    # canonical key per alias (reference models.py:582-614 cfg lookups)
    cfg_key = {"mixture-of-experts": "moe",
               "mixture-of-input-experts": "imoe",
               "iterative": "iterative"}.get(net_type, net_type)
    sub = dict(cfg.get(cfg_key) or {})
    if net_type == "mlp":
        module = MLP(output_dim,
                     tuple(sub.get("layers",
                                   sub.get("hidden_dims", (256, 256)))),
                     activ_name(sub.get("activation", "relu")),
                     float(sub.get("dropout", 0.0)))
    elif net_type == "resnet":
        # reference resnet_cfg: per-block 'layers' sizes + proj_layer
        # (models.py:224-246); width/depth kept as a back-compat alias.
        layers = sub.get("layers")
        if layers is None:
            layers = (int(sub.get("width", 256)),) * int(
                sub.get("depth", 3))
        module = ResNet1D(output_dim, tuple(int(v) for v in layers),
                          bool(sub.get("proj_layer", True)),
                          activ_name(sub.get("activation", "relu")))
    elif net_type in ("moe", "mixture-of-experts"):
        # reference: moe_cfg['network'] is the recursive gate/expert cfg
        # (models.py:279-286); hidden_dims kept as a back-compat alias.
        inner = dict(sub.get("network") or {})
        inner_sub = dict(inner.get(inner.get("type", "mlp")) or {})
        module = MixtureOfExperts(
            output_dim,
            int(sub.get("num_experts", 8)),  # models.py:276 default
            tuple(inner_sub.get("layers",
                                sub.get("hidden_dims", (128,)))),
            activ_name(inner_sub.get("activation", "relu")),
        )
    elif net_type in ("imoe", "mixture-of-input-experts"):
        # reference: imoe_cfg['network'] is the recursive expert cfg
        # (models.py:309-330)
        inner = dict(sub.get("network") or {})
        inner_type = inner.get("type", "mlp")
        inner_sub = dict(inner.get(inner_type) or {})
        module = MixtureOfInputExperts(
            output_dim,
            expert_type=inner_type,
            expert_layers=tuple(inner_sub.get(
                "layers", inner_sub.get("hidden_dims", (64,)))),
            activation=activ_name(inner_sub.get("activation", "relu")),
        )
    elif net_type == "iterative":
        # reference: iter_cfg has append_params/num_stages and a nested
        # network.rnn cfg (models.py:478-505)
        rnn = dict(dict(sub.get("network") or {}).get("rnn") or {})
        module = IterativeRegressorRNN(
            output_dim,
            hidden_dims=tuple(rnn.get("layer_dims", (1024,))),
            cell_type=rnn.get("type", "lstm"),
            dropout=float(rnn.get("dropout", 0.0)),
            learn_state=bool(rnn.get("learn_state", False)),
            append_params=bool(sub.get("append_params", True)),
            num_stages=int(sub.get("num_stages", 3)),
        )
    elif net_type == "linear":
        module = LinearNet(output_dim)
    elif net_type == "simple":
        module = SimpleNet(input_dim, output_dim)
    else:
        raise ValueError(f"Unknown network type: {net_type}")
    return FlaxRegressor(
        module,
        input_dim,
        learning_rate=float(sub.get("learning_rate", 1e-3)),
        num_steps=int(sub.get("num_steps", 2000)),
    )

"""Additional regressor-network bodies: RNN cells, FCN, non-local block.

Behavioural spec: reference ``regressor/human_shape/models/common/
networks.py``: ``MultiLayerRNNCell`` (stacked GRU/LSTM cells feeding the
iterative regressor, :400-490), ``FCN`` (conv head variant), and
``NonLocalBlock`` (self-attention over feature maps, :676-724). Same
functional param-dict style as the MLP head.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _linear_init(rng, in_dim: int, out_dim: int, scale: float = None):
    bound = scale if scale is not None else 1.0 / np.sqrt(in_dim)
    w = rng.uniform(-bound, bound, size=(out_dim, in_dim))
    b = rng.uniform(-bound, bound, size=(out_dim,))
    return jnp.asarray(w, jnp.float32), jnp.asarray(b, jnp.float32)


def gru_cell_init(input_dim: int, hidden_dim: int, seed: int = 0
                  ) -> Dict[str, Array]:
    rng = np.random.default_rng(seed)
    p = {}
    p["w_ih"], p["b_ih"] = _linear_init(rng, input_dim, 3 * hidden_dim)
    p["w_hh"], p["b_hh"] = _linear_init(rng, hidden_dim, 3 * hidden_dim)
    return p


def gru_cell_forward(params: Dict[str, Array], x: Array, h: Array
                     ) -> Array:
    """torch.nn.GRUCell semantics."""
    gi = x @ params["w_ih"].T + params["b_ih"]
    gh = h @ params["w_hh"].T + params["b_hh"]
    H = h.shape[-1]
    i_r, i_z, i_n = gi[..., :H], gi[..., H:2 * H], gi[..., 2 * H:]
    h_r, h_z, h_n = gh[..., :H], gh[..., H:2 * H], gh[..., 2 * H:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1 - z) * n + z * h


class MultiLayerRNNCell:
    """Stacked GRU cells + output linear (networks.py MultiLayerRNNCell)."""

    def __init__(self, input_dim: int, output_dim: int,
                 hidden_dims: Sequence[int] = (1024, 1024),
                 seed: int = 0):
        self.input_dim = input_dim
        self.output_dim = output_dim
        self.hidden_dims = tuple(hidden_dims)
        rng = np.random.default_rng(seed + 999)
        params: Dict[str, Dict] = {}
        d = input_dim
        for i, h in enumerate(self.hidden_dims):
            params[f"cell_{i}"] = gru_cell_init(d, h, seed + i)
            d = h
        w, b = _linear_init(rng, d, output_dim, scale=0.01)
        params["output"] = {"weight": w, "bias": b}
        self.params = params

    def init_state(self, batch: int) -> List[Array]:
        return [jnp.zeros((batch, h)) for h in self.hidden_dims]

    def apply(self, params: Dict, x: Array, state: List[Array]
              ) -> Tuple[Array, List[Array]]:
        new_state = []
        h = x
        for i in range(len(self.hidden_dims)):
            h = gru_cell_forward(params[f"cell_{i}"], h, state[i])
            new_state.append(h)
        out = h @ params["output"]["weight"].T + params["output"]["bias"]
        return out, new_state


def fcn_init(in_channels: int, out_channels: int,
             layers: Sequence[int] = (1024, 1024), kernel: int = 3,
             seed: int = 0) -> Dict[str, Array]:
    """1x1/3x3 conv head over feature maps (networks.py FCN)."""
    rng = np.random.default_rng(seed)
    params: Dict[str, Array] = {}
    c = in_channels
    for i, width in enumerate(layers):
        fan_in = c * kernel * kernel
        params[f"conv_{i}.weight"] = jnp.asarray(
            rng.normal(size=(kernel, kernel, c, width))
            * np.sqrt(2.0 / fan_in),
            jnp.float32,
        )
        params[f"conv_{i}.bias"] = jnp.zeros(width)
        c = width
    params["out.weight"] = jnp.asarray(
        rng.normal(size=(1, 1, c, out_channels)) * 0.01, jnp.float32
    )
    params["out.bias"] = jnp.zeros(out_channels)
    return params


def fcn_forward(params: Dict[str, Array], x: Array, num_layers: int,
                kernel: int = 3) -> Array:
    pad = kernel // 2
    for i in range(num_layers):
        x = jax.lax.conv_general_dilated(
            x, params[f"conv_{i}.weight"], (1, 1),
            [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params[f"conv_{i}.bias"]
        x = jax.nn.relu(x)
    x = jax.lax.conv_general_dilated(
        x, params["out.weight"], (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["out.bias"]
    return x


def non_local_block_init(channels: int, reduction: int = 2, seed: int = 0
                         ) -> Dict[str, Array]:
    rng = np.random.default_rng(seed)
    c_red = channels // reduction
    return {
        "theta.weight": jnp.asarray(
            rng.normal(size=(1, 1, channels, c_red)) * 0.01, jnp.float32
        ),
        "proj.weight": jnp.asarray(
            rng.normal(size=(1, 1, c_red, channels)) * 0.01, jnp.float32
        ),
        "scale": jnp.zeros((1, 1, 1, channels)),
    }


def non_local_block_forward(params: Dict[str, Array], x: Array,
                            reduction: int = 2) -> Array:
    """Self-attention over spatial positions (networks.py NonLocalBlock
    :676-724): y = softmax(theta(x) theta(x)^T) theta(x), out = proj(y) *
    scale + x."""
    B, H, W, C = x.shape
    theta = jax.lax.conv_general_dilated(
        x, params["theta.weight"], (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).reshape(B, H * W, -1)
    attn = jax.nn.softmax(
        jnp.einsum("bmc,bnc->bmn", theta, theta), axis=-1
    )
    y = jnp.einsum("bmn,bnc->bmc", attn, theta).reshape(B, H, W, -1)
    out = jax.lax.conv_general_dilated(
        y, params["proj.weight"], (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out * params["scale"] + x

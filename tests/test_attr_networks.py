"""Attribute network zoo: random-weight forward parity against the
ACTUAL reference classes (attributes_betas/models.py) and fit smoke on
synthetic data for the configs build_network accepts
(models.py:582-637)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests import reference_compat as rc

from shapy_tpu.models.attributes.networks import (
    FlaxRegressor,
    IterativeRegressorRNN,
    MixtureOfInputExperts,
    MultiLayerRNNCell,
    SimpleNet,
    build_network,
)

NO_NORM = {"type": "none"}
RELU = {"type": "relu"}


def _torch_linear_to_dense(linear):
    return {
        "kernel": jnp.asarray(
            linear.weight.detach().numpy().T, jnp.float32),
        "bias": jnp.asarray(linear.bias.detach().numpy(), jnp.float32),
    }


def _ref_mlp_to_flax(ref_mlp):
    """reference MLP (layers.{i}.fc + output_layer) -> our MLP
    (Dense_0..Dense_n)."""
    out = {}
    for i, layer in enumerate(ref_mlp.layers):
        out[f"Dense_{i}"] = _torch_linear_to_dense(layer.fc)
    out[f"Dense_{len(ref_mlp.layers)}"] = _torch_linear_to_dense(
        ref_mlp.output_layer)
    return out


def test_mixture_of_input_experts_parity(rng):
    """Forward parity vs reference MixtureOfInputExperts
    (models.py:309-351): per-input-feature experts, softmax gate."""
    m = rc.load_ref_attr_models()
    D, OUT = 5, 4
    torch.manual_seed(0)
    ref = m.MixtureOfInputExperts(
        D, OUT,
        input_moe_cfg={"network": {
            "type": "mlp",
            "mlp": {"layers": [8], "activation": RELU,
                    "normalization": NO_NORM},
        }},
    ).eval()

    ours = MixtureOfInputExperts(OUT, expert_type="mlp",
                                 expert_layers=(8,), activation="relu")
    x = rng.normal(size=(3, D)).astype(np.float32)
    variables = ours.init(__import__("jax").random.PRNGKey(0),
                          jnp.asarray(x))
    params = dict(variables["params"])
    params["gating"] = _ref_mlp_to_flax(ref.gating)
    for i, ffn in enumerate(ref.ffns):
        params[f"expert_{i}"] = _ref_mlp_to_flax(ffn)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()
    our_out = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(our_out, ref_out, atol=2e-6)


def test_iterative_rnn_parity(rng):
    """Forward parity vs reference IterativeRegressor
    (models.py:478-539) on the configuration the reference can actually
    execute (single-layer GRU): same torch weight stacks, same stage
    accumulation, same constant [features, mean] input per stage."""
    m = rc.load_ref_attr_models()
    D, OUT, H = 6, 4, 16
    torch.manual_seed(1)
    ref = m.IterativeRegressor(
        D, OUT,
        iter_cfg={
            # init_type must be spelled 'zeros': the reference default
            # 'zero' trips its own assert (models.py:396-403)
            "network": {"rnn": {"type": "gru", "layer_dims": [H],
                                "init_type": "zeros"}},
            "num_stages": 3,
            "append_params": True,
        },
    ).eval()

    ours = IterativeRegressorRNN(OUT, hidden_dims=(H,), cell_type="gru",
                                 num_stages=3, append_params=True)
    x = rng.normal(size=(3, D)).astype(np.float32)
    import jax

    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    cell = ref.regressor.rnn_list[0]
    params = {
        "regressor": {
            "weight_ih_l0": jnp.asarray(cell.weight_ih.detach().numpy()),
            "weight_hh_l0": jnp.asarray(cell.weight_hh.detach().numpy()),
            "bias_ih_l0": jnp.asarray(cell.bias_ih.detach().numpy()),
            "bias_hh_l0": jnp.asarray(cell.bias_hh.detach().numpy()),
            "output": _torch_linear_to_dense(ref.regressor.output),
        }
    }
    buffers = {"param_mean": jnp.asarray(
        ref.param_mean.detach().numpy())}

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()
    our_out = np.asarray(ours.apply(
        {"params": params, "buffers": buffers}, jnp.asarray(x)))
    np.testing.assert_allclose(our_out, ref_out, atol=5e-6)


def test_multilayer_rnn_lstm_state_threading(rng):
    """LSTM path: torch LSTMCell parity for a single step + state
    threading across calls (the reference's own LSTM forward crashes,
    models.py:455-469; ours implements the documented semantics)."""
    D, H, OUT = 5, 8, 3
    torch.manual_seed(2)
    cell = torch.nn.LSTMCell(D, H)
    out_lin = torch.nn.Linear(H, OUT)

    ours = MultiLayerRNNCell(OUT, hidden_dims=(H,), cell_type="lstm")
    x1 = rng.normal(size=(2, D)).astype(np.float32)
    x2 = rng.normal(size=(2, D)).astype(np.float32)
    import jax

    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x1))
    params = {
        "weight_ih_l0": jnp.asarray(cell.weight_ih.detach().numpy()),
        "weight_hh_l0": jnp.asarray(cell.weight_hh.detach().numpy()),
        "bias_ih_l0": jnp.asarray(cell.bias_ih.detach().numpy()),
        "bias_hh_l0": jnp.asarray(cell.bias_hh.detach().numpy()),
        "output": _torch_linear_to_dense(out_lin),
    }

    with torch.no_grad():
        h1, c1 = cell(torch.from_numpy(x1))
        h2, c2 = cell(torch.from_numpy(x2), (h1, c1))
        ref_out = out_lin(h2).numpy()

    o1, state = ours.apply({"params": params}, jnp.asarray(x1))
    o2, state = ours.apply({"params": params}, jnp.asarray(x2), state)
    np.testing.assert_allclose(np.asarray(state[0][0]), h2.numpy(),
                               atol=5e-6)
    np.testing.assert_allclose(np.asarray(o2), ref_out, atol=5e-6)


def test_simple_network_parity(rng):
    """'simple' = 3-linear ReLU stack with interpolated hidden sizes
    (models.py:611-624), not a single linear layer."""
    m = rc.load_ref_attr_models()
    D, OUT = 9, 3
    torch.manual_seed(3)
    ref = m.build_network({"type": "simple"}, D, OUT).eval()
    linears = [mod for mod in ref if isinstance(mod, torch.nn.Linear)]
    assert len(linears) == 3

    ours = SimpleNet(D, OUT)
    x = rng.normal(size=(4, D)).astype(np.float32)
    import jax

    ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = {
        f"Dense_{i}": _torch_linear_to_dense(lin)
        for i, lin in enumerate(linears)
    }
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()
    our_out = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(our_out, ref_out, atol=2e-6)


@pytest.mark.parametrize("cfg", [
    {"type": "imoe", "imoe": {
        "network": {"type": "mlp", "mlp": {"layers": [8]}},
        "learning_rate": 1e-2, "num_steps": 150}},
    {"type": "iterative", "iterative": {
        "network": {"rnn": {"type": "gru", "layer_dims": [16]}},
        "num_stages": 2,
        "learning_rate": 1e-2, "num_steps": 150}},
])
def test_build_network_fits_synthetic(cfg, rng):
    """build_network accepts the reference's input_moe / iterative
    configs and the resulting regressors fit a synthetic linear DB."""
    D, OUT, N = 4, 3, 256
    X = rng.normal(size=(N, D)).astype(np.float32)
    W = rng.normal(size=(D, OUT)).astype(np.float32)
    Y = X @ W

    net = build_network(cfg, D, OUT)
    assert isinstance(net, FlaxRegressor)
    base = float(np.mean((net.predict(X) - Y) ** 2))
    net.fit(X, Y)
    fitted = float(np.mean((net.predict(X) - Y) ** 2))
    assert fitted < base * 0.25

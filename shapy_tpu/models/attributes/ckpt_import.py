"""Torch-checkpoint import for the attribute network zoo.

The reference loads ANY trained A2B/B2A variant through Lightning's
``load_from_checkpoint`` (``/root/reference/attributes/demo.py:54``); the
checkpoint's ``state_dict`` holds the network under the ``a2b.`` /
``b2a.`` prefix with torch parameter names (``models.py:113-557``). This
module maps each reference architecture onto its flax equivalent in
:mod:`shapy_tpu.models.attributes.networks`, so a user's own trained
checkpoint of any network type carries over — not just the shipped
``Polynomial``.

Normalization handling: the reference's ``FCNormActiv`` / ``BasicBlock``
default to ``BatchNorm1d`` after each linear (``models.py:49-75``; note
the linear then has NO bias). Prediction always runs in eval mode, where
BatchNorm is the affine map ``y = γ(x−μ)/√(σ²+ε) + β`` — folded here
into the preceding linear at import, giving exact eval-mode parity with
plain Dense layers on the flax side. LayerNorm/GroupNorm cannot be
folded and raise a clear error.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from shapy_tpu.models.attributes.networks import (
    MLP,
    FlaxRegressor,
    IterativeRegressorRNN,
    LinearNet,
    MixtureOfExperts,
    MixtureOfInputExperts,
    ResNet1D,
    SimpleNet,
)
from shapy_tpu.models.attributes.polynomial import Polynomial

BN_EPS = 1e-5  # torch BatchNorm1d default


def _np(t) -> np.ndarray:
    return np.asarray(t, np.float32)


def _fold_bn(w: np.ndarray, b: np.ndarray, sd: Dict, norm: str):
    """Fold an eval-mode torch BatchNorm1d at ``norm`` into (w, b)
    (torch layout: w is (out, in))."""
    eps = BN_EPS
    gamma = _np(sd[f"{norm}.weight"])
    beta = _np(sd[f"{norm}.bias"])
    mean = _np(sd[f"{norm}.running_mean"])
    var = _np(sd[f"{norm}.running_var"])
    scale = gamma / np.sqrt(var + eps)
    return w * scale[:, None], (b - mean) * scale + beta


def _dense(sd: Dict, key: str, norm: Optional[str] = None) -> Dict:
    """torch Linear at ``key`` (+ optional following norm layer) ->
    flax Dense params."""
    w = _np(sd[f"{key}.weight"])
    b = sd.get(f"{key}.bias")
    b = np.zeros(w.shape[0], np.float32) if b is None else _np(b)
    if norm is not None:
        if f"{norm}.running_mean" in sd:
            w, b = _fold_bn(w, b, sd, norm)
        elif f"{norm}.weight" in sd:
            raise ValueError(
                f"{norm}: LayerNorm/GroupNorm cannot be folded into a "
                "linear at import; re-export the checkpoint without "
                "sample-dependent normalization"
            )
    return {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)}


def _fc_norm_activ(sd: Dict, prefix: str) -> Dict:
    """Reference FCNormActiv (models.py:77-112): fc + optional norm."""
    norm = f"{prefix}.norm_layer"
    has_norm = any(k.startswith(norm + ".") for k in sd)
    return _dense(sd, f"{prefix}.fc", norm if has_norm else None)


def _mlp_params(sd: Dict, prefix: str) -> Dict:
    out = {}
    i = 0
    while f"{prefix}layers.{i}.fc.weight" in sd:
        out[f"Dense_{i}"] = _fc_norm_activ(sd, f"{prefix}layers.{i}")
        # learnable PReLU slope (the only parametric activation,
        # models.py:37-39; key exists only for prelu checkpoints)
        if f"{prefix}layers.{i}.activ.weight" in sd:
            out[f"prelu_{i}"] = jnp.asarray(
                _np(sd[f"{prefix}layers.{i}.activ.weight"]))
        i += 1
    out[f"Dense_{i}"] = _dense(sd, f"{prefix}output_layer")
    return out


def _resnet_params(sd: Dict, prefix: str) -> Dict:
    out = {}
    if f"{prefix}projection.fc.weight" in sd:
        out["projection"] = _fc_norm_activ(sd, f"{prefix}projection")
        if f"{prefix}projection.activ.weight" in sd:
            out["projection_prelu"] = jnp.asarray(
                _np(sd[f"{prefix}projection.activ.weight"]))
    i = 0
    while f"{prefix}network.{i}.linear1.weight" in sd:
        blk = f"{prefix}network.{i}"
        block = {
            "linear1": _dense(sd, f"{blk}.linear1", f"{blk}.norm1"),
            "linear2": _dense(sd, f"{blk}.linear2", f"{blk}.norm2"),
        }
        if f"{blk}.downsample.0.weight" in sd:
            block["downsample"] = _dense(
                sd, f"{blk}.downsample.0", f"{blk}.downsample.1"
            )
        if f"{blk}.act.weight" in sd:  # shared per-block PReLU slope
            block["act_weight"] = jnp.asarray(
                _np(sd[f"{blk}.act.weight"]))
        out[f"block_{i}"] = block
        i += 1
    # trailing plain Linear (models.py:255)
    out["final"] = _dense(sd, f"{prefix}network.{i}")
    return out


def _rnn_params(sd: Dict, prefix: str) -> Dict:
    """Reference MultiLayerRNNCell (models.py:355-477) -> our
    MultiLayerRNNCell (torch weight layout is kept verbatim)."""
    out: Dict = {}
    i = 0
    while f"{prefix}rnn_list.{i}.weight_ih" in sd:
        for name in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            out[f"{name}_l{i}"] = jnp.asarray(
                _np(sd[f"{prefix}rnn_list.{i}.{name}"]))
        i += 1
    out["output"] = _dense(sd, f"{prefix}output")
    n = 0
    while f"{prefix}hidden_state.{n}" in sd:
        out[f"state{n:02d}_l0"] = jnp.asarray(
            _np(sd[f"{prefix}hidden_state.{n}"]))
        n += 1
    return out


def _moe_params(sd: Dict, prefix: str, gate_name: str = "gating") -> Dict:
    """Reference MixtureOf(Input)Experts: gating net + per-expert nets,
    each an inner build_network product (MLP or plain Linear)."""

    def inner(p: str) -> Dict:
        if f"{p}.weight" in sd:  # bare nn.Linear expert
            return {"Dense_0": _dense(sd, p)}
        return _mlp_params(sd, p + ".")

    out = {gate_name: inner(f"{prefix}gating")}
    i = 0
    while any(k.startswith(f"{prefix}ffns.{i}.") for k in sd):
        out[f"expert_{i}"] = inner(f"{prefix}ffns.{i}")
        i += 1
    return out


def network_params_from_torch(module, sd: Dict, prefix: str) -> Dict:
    """State-dict block at ``prefix`` -> variables dict for ``module``
    (one of the flax zoo classes). Returns {'params': ...} plus
    'buffers' when the architecture carries them."""
    if isinstance(module, MLP):
        return {"params": _mlp_params(sd, prefix)}
    if isinstance(module, ResNet1D):
        return {"params": _resnet_params(sd, prefix)}
    if isinstance(module, SimpleNet):
        # nn.Sequential(Linear, ReLU, Linear, ReLU, Linear)
        return {"params": {
            f"Dense_{j}": _dense(sd, f"{prefix}{2 * j}")
            for j in range(3)
        }}
    if isinstance(module, LinearNet):
        return {"params": {"Dense_0": _dense(sd, prefix.rstrip("."))}}
    if isinstance(module, MixtureOfInputExperts):
        return {"params": _moe_params(sd, prefix)}
    if isinstance(module, MixtureOfExperts):
        return {"params": _moe_params(sd, prefix)}
    if isinstance(module, IterativeRegressorRNN):
        variables: Dict = {
            "params": {"regressor": _rnn_params(sd, f"{prefix}regressor.")}
        }
        if f"{prefix}param_mean" in sd:
            variables["buffers"] = {
                "param_mean": jnp.asarray(_np(sd[f"{prefix}param_mean"]))
            }
        return variables
    raise TypeError(
        f"No torch importer for network module {type(module).__name__}"
    )


def import_network(net, sd: Dict, prefix: str = "a2b."):
    """Load reference-trained weights into a ``build_network`` product
    (Polynomial or FlaxRegressor); returns ``net`` mutated."""
    if isinstance(net, Polynomial):
        net.params = {
            "weight": jnp.asarray(_np(sd[f"{prefix}linear.weight"])),
            "bias": jnp.asarray(_np(sd[f"{prefix}linear.bias"])),
        }
        return net
    if isinstance(net, FlaxRegressor):
        variables = network_params_from_torch(net.module, sd, prefix)
        merged = dict(net.variables)
        merged.update(variables)
        net.variables = merged
        return net
    raise TypeError(f"Cannot import into {type(net).__name__}")

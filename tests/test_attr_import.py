"""Torch-checkpoint import parity for the attribute network zoo.

Each test builds the ACTUAL reference network class
(attributes_betas/models.py via reference_compat), evaluates it on random
inputs in eval mode, synthesizes the Lightning-style state-dict block a
real A2B checkpoint stores (``a2b.<param>``), imports it through
shapy_tpu.models.attributes.ckpt_import, and asserts forward parity.
This closes the reference surface ``demo.py:54`` (load_from_checkpoint
for ANY trained network type, not just Polynomial)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests import reference_compat as rc

from shapy_tpu.models.attributes.ckpt_import import import_network
from shapy_tpu.models.attributes.networks import build_network

BN = {"type": "bn"}
NO_NORM = {"type": "none"}
RELU = {"type": "relu"}


def _sd(ref, prefix="a2b."):
    """Reference module -> the state-dict block a Lightning A2B ckpt
    stores (incl. buffers: running stats, param_mean)."""
    return {prefix + k: v.detach().numpy()
            for k, v in ref.state_dict().items()}


def _check(ref, ours, rng, D, atol=2e-5):
    x = rng.normal(size=(7, D)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.predict(x))
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-4)


def _bn_warmup(ref, rng, D):
    """Run a few training-mode batches so BN running stats are
    non-trivial (a freshly-initialised BN would fold to identity)."""
    ref.train()
    with torch.no_grad():
        for _ in range(3):
            ref(torch.from_numpy(
                rng.normal(size=(32, D)).astype(np.float32) * 2.0 + 0.5))
    ref.eval()


@pytest.mark.parametrize("norm", [BN, NO_NORM])
def test_import_mlp(rng, norm):
    m = rc.load_ref_attr_models()
    D, OUT = 6, 4
    torch.manual_seed(0)
    cfg = {"type": "mlp",
           "mlp": {"layers": [16, 8], "activation": RELU,
                   "normalization": norm}}
    ref = m.build_network(cfg, D, OUT)
    _bn_warmup(ref, rng, D)
    ours = import_network(build_network(cfg, D, OUT), _sd(ref))
    _check(ref, ours, rng, D)


def test_import_resnet(rng):
    """Reference ResNet (BN default, models.py:224-262) incl. a
    downsample block (changing widths)."""
    m = rc.load_ref_attr_models()
    D, OUT = 6, 4
    torch.manual_seed(1)
    cfg = {"type": "resnet",
           "resnet": {"layers": [12, 8], "activation": RELU,
                      "normalization": BN}}
    ref = m.build_network(cfg, D, OUT)
    _bn_warmup(ref, rng, D)
    ours = import_network(build_network(cfg, D, OUT), _sd(ref))
    _check(ref, ours, rng, D)


def test_import_resnet_leaky_relu(rng):
    """A non-default activation must survive the import: the reference
    plumbs the activation cfg into the projection and every BasicBlock
    (models.py:23-46, 163-262); parameter names are activation-agnostic
    so only a forward-parity check catches a dropped activation."""
    m = rc.load_ref_attr_models()
    D, OUT = 6, 4
    torch.manual_seed(4)
    cfg = {"type": "resnet",
           "resnet": {"layers": [12, 8],
                      "activation": {"type": "leaky-relu"},
                      "normalization": BN}}
    ref = m.build_network(cfg, D, OUT)
    _bn_warmup(ref, rng, D)
    ours = import_network(build_network(cfg, D, OUT), _sd(ref))
    _check(ref, ours, rng, D)


@pytest.mark.parametrize("net_type", ["mlp", "resnet"])
def test_import_prelu(rng, net_type):
    """Learnable PReLU slopes (the one parametric activation,
    models.py:37-39) must carry over: randomise every torch slope so
    parity cannot hold with the 0.25 init or a relu fallback."""
    m = rc.load_ref_attr_models()
    D, OUT = 6, 4
    torch.manual_seed(5)
    cfg = {"type": net_type,
           net_type: {"layers": [12, 8],
                      "activation": {"type": "prelu"},
                      "normalization": BN}}
    ref = m.build_network(cfg, D, OUT)
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if name.endswith(("act.weight", "activ.weight")):
                p.copy_(torch.from_numpy(
                    rng.uniform(-0.8, 0.8, p.shape).astype(np.float32)))
    _bn_warmup(ref, rng, D)
    ours = import_network(build_network(cfg, D, OUT), _sd(ref))
    _check(ref, ours, rng, D)


def test_import_moe(rng):
    m = rc.load_ref_attr_models()
    D, OUT = 5, 3
    torch.manual_seed(2)
    cfg = {"type": "moe",
           "moe": {"num_experts": 3,
                   "network": {"type": "mlp",
                               "mlp": {"layers": [8], "activation": RELU,
                                       "normalization": NO_NORM}}}}
    ref = m.build_network(cfg, D, OUT).eval()
    ours = import_network(build_network(cfg, D, OUT), _sd(ref))
    _check(ref, ours, rng, D)


def test_import_imoe(rng):
    m = rc.load_ref_attr_models()
    D, OUT = 5, 3
    torch.manual_seed(3)
    cfg = {"type": "imoe",
           "imoe": {"network": {"type": "mlp",
                                "mlp": {"layers": [8], "activation": RELU,
                                        "normalization": NO_NORM}}}}
    ref = m.build_network(cfg, D, OUT).eval()
    ours = import_network(build_network(cfg, D, OUT), _sd(ref))
    _check(ref, ours, rng, D)


# gru only: the reference's LSTM path crashes in its own forward
# (models.py:455 `module(x, *state)` passes the state pair positionally,
# LSTMCell wants a tuple) — no reference LSTM checkpoint can exist.
@pytest.mark.parametrize("rnn_type", ["gru"])
def test_import_iterative(rng, rnn_type):
    m = rc.load_ref_attr_models()
    D, OUT = 6, 4
    torch.manual_seed(4)
    cfg = {"type": "iterative",
           "iterative": {"num_stages": 3, "append_params": True,
                         # init_type must be spelled 'zeros': the
                         # reference default 'zero' trips its own assert
                         # (models.py:396-403)
                         "network": {"rnn": {"type": rnn_type,
                                             "layer_dims": [16],
                                             "init_type": "zeros",
                                             "dropout": 0.0}}}}
    ref = m.build_network(cfg, D, OUT).eval()
    ours = import_network(build_network(cfg, D, OUT), _sd(ref))
    _check(ref, ours, rng, D)


def test_import_linear_and_simple(rng):
    m = rc.load_ref_attr_models()
    D, OUT = 6, 4
    for cfg in ({"type": "linear"}, {"type": "simple"}):
        torch.manual_seed(5)
        ref = m.build_network(cfg, D, OUT).eval()
        ours = import_network(build_network(cfg, D, OUT), _sd(ref))
        _check(ref, ours, rng, D)


def test_import_layernorm_rejected(rng):
    m = rc.load_ref_attr_models()
    cfg = {"type": "mlp",
           "mlp": {"layers": [8], "activation": RELU,
                   "normalization": {"type": "ln"}}}
    ref = m.build_network(cfg, 6, 4).eval()
    with pytest.raises(ValueError, match="folded"):
        import_network(build_network(cfg, 6, 4), _sd(ref))


def test_a2b_b2a_end_to_end_import(tmp_path, rng):
    """Full Lightning-checkpoint round trip through the public
    A2B/B2A.load_from_checkpoint — a non-polynomial (resnet+BN default)
    network carried over losslessly (reference demo.py:54)."""
    import torch as _torch

    from shapy_tpu.models.attributes.a2b import A2B
    from shapy_tpu.models.attributes.b2a import B2A

    m = rc.load_ref_attr_models()
    net_cfg = {"type": "resnet",
               "resnet": {"layers": [12, 8], "activation": RELU,
                          "normalization": BN}}
    feat = {"use_attributes": False, "use_measurements": True,
            "measurements": {"height": True, "chest": True,
                             "waist": True, "hips": True}}
    conf = dict(feat, num_shape_comps=10, network=net_cfg)
    # A2B: features(4) -> betas(10); B2A: betas(10) -> features(4)
    for cls, prefix, d_in, d_out in (
        (A2B, "a2b.", 4, 10),
        (B2A, "b2a.", 10, 4),
    ):
        torch.manual_seed(7)
        ref = m.build_network(net_cfg, d_in, d_out)
        _bn_warmup(ref, rng, d_in)
        x = rng.normal(size=(3, d_in)).astype(np.float32)
        with _torch.no_grad():
            want = ref(_torch.from_numpy(x)).numpy()
        path = str(tmp_path / f"{prefix}ckpt")
        _torch.save(
            {"state_dict": {prefix + k: v
                            for k, v in ref.state_dict().items()},
             "hyper_parameters": {"cfg": conf}},
            path,
        )
        model = cls.load_from_checkpoint(path)
        net = getattr(model, prefix[:-1])
        got = np.asarray(net.predict(x))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

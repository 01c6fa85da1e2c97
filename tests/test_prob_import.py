"""A2BProbabilistic checkpoint import parity.

Synthesizes Lightning-style checkpoints from the ACTUAL reference
probabilistic heads (attributes_betas/prob.py via reference_compat, with
the nflows numerics stand-in), imports them through
``A2BProbabilistic.load_from_checkpoint``, and asserts NLL / point
estimate / sampling parity. Reference surface: demo.py:54 with
MODEL_DICT['a2b-prob'] (any trained probabilistic checkpoint loads)."""

import numpy as np
import pytest
import torch

from tests import reference_compat as rc

from shapy_tpu.models.attributes.prob import A2BProbabilistic

RELU = {"type": "relu"}
NO_NORM = {"type": "none"}

# measurements-only feature selection -> input_dim == 4
FEATURES = {
    "use_attributes": False,
    "use_measurements": True,
    "measurements": {"height": True, "chest": True,
                     "waist": True, "hips": True},
}
NET = {"type": "mlp",
       "mlp": {"layers": [16], "activation": RELU,
               "normalization": NO_NORM}}
D_IN, D_OUT = 4, 10


def _save_ckpt(tmp_path, ref, cfg):
    path = str(tmp_path / "prob.ckpt")
    torch.save(
        {"state_dict": {"a2b." + k: v for k, v in
                        ref.state_dict().items()},
         "hyper_parameters": {"cfg": cfg}},
        path,
    )
    return path


@pytest.mark.parametrize("covariance", ["diagonal", "tril"])
def test_import_mvn(tmp_path, rng, covariance):
    m = rc.load_ref_prob()
    torch.manual_seed(0)
    cfg = dict(FEATURES, num_shape_comps=D_OUT, network=NET,
               probabilistic={"type": "gaussian",
                              "gaussian": {"covariance": covariance}})
    ref = m.build_distr_regressor(cfg, D_IN, D_OUT).eval()
    if covariance == "tril":
        # Untrained tril checkpoints emit negative Cholesky diagonals
        # (the reference's own NLL NaNs there, prob.py:104-109); shift
        # the output bias so the synthetic ckpt is in the trained regime.
        with torch.no_grad():
            ref.net.output_layer.bias[D_OUT:] += 2.0

    model = A2BProbabilistic.load_from_checkpoint(
        _save_ckpt(tmp_path, ref, cfg))
    x = rng.normal(size=(5, D_IN)).astype(np.float32)
    y = rng.normal(size=(5, D_OUT)).astype(np.float32)

    with torch.no_grad():
        want_nll = ref.neg_log_likelihood(
            torch.from_numpy(x), torch.from_numpy(y)).numpy()
        want_mean = ref(torch.from_numpy(x))["mean"].numpy()
    got_nll = np.asarray(model.neg_log_likelihood(x, y))
    np.testing.assert_allclose(got_nll, want_nll, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(model.predict(x), want_mean,
                               rtol=1e-4, atol=1e-5)
    # sampling runs and has the interface shape (N, B, D)
    import jax

    s = model.sample(x, jax.random.PRNGKey(0), num_samples=3)
    assert s.shape == (3, 5, D_OUT)
    assert np.isfinite(np.asarray(s)).all()


def test_import_flow(tmp_path, rng):
    m = rc.load_ref_prob()
    torch.manual_seed(1)
    cfg = dict(FEATURES, num_shape_comps=D_OUT, network=NET,
               probabilistic={"type": "flow",
                              "flow": {"num_blocks": 3,
                                       "coupling_type":
                                           "conditional-affine"}})
    ref = m.build_distr_regressor(cfg, D_IN, D_OUT).eval()
    # Give the flow non-trivial (trained-looking) parameters: randomise
    # ActNorm and LULinear entries away from the identity init.
    with torch.no_grad():
        for mod in ref.flow._transform._transforms:
            if hasattr(mod, "log_scale"):
                mod.log_scale.add_(torch.randn_like(mod.log_scale) * 0.2)
                mod.shift.add_(torch.randn_like(mod.shift) * 0.3)
            if hasattr(mod, "lower_entries"):
                mod.lower_entries.add_(
                    torch.randn_like(mod.lower_entries) * 0.2)
                mod.upper_entries.add_(
                    torch.randn_like(mod.upper_entries) * 0.2)
                mod.bias.add_(torch.randn_like(mod.bias) * 0.1)

    model = A2BProbabilistic.load_from_checkpoint(
        _save_ckpt(tmp_path, ref, cfg))
    x = rng.normal(size=(5, D_IN)).astype(np.float32)
    y = rng.normal(size=(5, D_OUT)).astype(np.float32)

    with torch.no_grad():
        want_nll = ref.neg_log_likelihood(
            torch.from_numpy(x), torch.from_numpy(y)).numpy()
        want_mean = ref(torch.from_numpy(x))["mean"].numpy()
    got_nll = np.asarray(model.neg_log_likelihood(x, y))
    np.testing.assert_allclose(got_nll, want_nll, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(model.predict(x), want_mean,
                               rtol=1e-4, atol=1e-5)

    # round-trip consistency of the imported transform itself
    head = model.head
    import jax.numpy as jnp

    noise, fwd_ld = head._transform(jnp.asarray(y), jnp.asarray(x))
    _, inv_ld = head._inverse(noise, jnp.asarray(x))
    # The reference coupling is lossy by construction (it overwrites the
    # second half with a function of the first, prob.py:252-253), so
    # values do NOT round-trip — but every block's log-det depends only
    # on the conditioning, so forward/inverse log-dets must be exact
    # negatives.
    np.testing.assert_allclose(np.asarray(fwd_ld), -np.asarray(inv_ld),
                               rtol=1e-4, atol=1e-5)

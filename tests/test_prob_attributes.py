import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shapy_tpu.models.attributes.prob import A2BProbabilistic
from shapy_tpu.models.attributes.utils import (
    ridge_fit,
    ridge_predict,
    sample_in_sphere,
)

CFG_BASE = {
    "type": "a2b-prob",
    "ds_gender": "female",
    "num_shape_comps": 4,
    "use_attributes": True,
    "use_measurements": False,
    "female_attributes": {"big": True, "tall": True, "short": True},
}


def make_data(rng, n=400, d_in=3, d_out=4):
    X = rng.normal(size=(n, d_in)).astype(np.float32)
    W = rng.normal(size=(d_in, d_out)).astype(np.float32)
    Y = X @ W + rng.normal(size=(n, d_out)).astype(np.float32) * 0.05
    return X, Y


@pytest.mark.parametrize("head", ["mvn", "flow"])
def test_probabilistic_heads_train_and_sample(rng, head):
    cfg = dict(CFG_BASE, probabilistic={"type": head, "num_layers": 4,
                                        "hidden": 32,
                                        "hidden_dims": (32,)})
    model = A2BProbabilistic(cfg)
    X, Y = make_data(rng)

    lp_before = float(jnp.mean(model.log_prob(
        jnp.asarray(Y[:64]), jnp.asarray(X[:64]))))
    model.fit(X, Y, num_steps=150, batch_size=128)
    lp_after = float(jnp.mean(model.log_prob(
        jnp.asarray(Y[:64]), jnp.asarray(X[:64]))))
    assert lp_after > lp_before  # likelihood improves

    samples = model.sample(jnp.asarray(X[:8]), jax.random.PRNGKey(0),
                           num_samples=5)
    assert samples.shape == (5, 8, 4)
    assert np.isfinite(np.asarray(samples)).all()

    point = model.predict(X[:8])
    assert point.shape == (8, 4)


def test_flow_invertibility(rng):
    cfg = dict(CFG_BASE, probabilistic={"type": "flow", "num_layers": 4,
                                        "hidden": 16})
    model = A2BProbabilistic(cfg)
    y = jnp.asarray(rng.normal(size=(6, 4)), jnp.float32)
    cond = jnp.asarray(rng.normal(size=(6, 3)), jnp.float32)
    z, ld_inv = model.module.apply(
        model.variables, y, cond, method=model.module.inverse
    )
    y2, ld_fwd = model.module.apply(
        model.variables, z, cond, method=model.module.forward
    )
    # atol 5e-5: coupling scales reach exp(±2), so float32 round-trip
    # error is a few ulps of ~10 — 1e-5 was marginal and flaked with
    # compilation (fusion) order across suite compositions.
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(ld_fwd + ld_inv), 0.0, atol=5e-5
    )


def test_sample_in_sphere(rng):
    pts = sample_in_sphere(rng, 2000, 5, radius=2.0)
    norms = np.linalg.norm(pts, axis=1)
    assert norms.max() <= 2.0 + 1e-9
    # roughly uniform: mean radius of uniform ball ~ r * d/(d+1)
    assert np.mean(norms) == pytest.approx(2.0 * 5 / 6, rel=0.05)


def test_ridge_matches_sklearn(rng):
    from sklearn.linear_model import Ridge

    X, Y = make_data(rng, n=200)
    w, b = ridge_fit(X, Y, alpha=0.7)
    sk = Ridge(alpha=0.7).fit(X, Y)
    np.testing.assert_allclose(w, sk.coef_, atol=1e-5)
    np.testing.assert_allclose(b, sk.intercept_, atol=1e-5)
    np.testing.assert_allclose(
        ridge_predict(X, w, b), sk.predict(X), atol=1e-5
    )

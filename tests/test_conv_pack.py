"""Correctness of the 2-pixel-packed Pallas conv (interpret mode on CPU;
the perf claim is measured on-chip by tools/perf_conv_pack.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from shapy_tpu.ops.conv_pack import (
    conv3x3_pack2,
    conv3x3_pack2_reference,
    pack_weights,
)


@pytest.mark.parametrize("relu", [False, True])
def test_packed_conv_matches_xla(relu):
    rng = np.random.default_rng(0)
    B, H, W, C = 2, 8, 16, 48
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    w = rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.1
    scale = rng.normal(size=C).astype(np.float32)
    bias = rng.normal(size=C).astype(np.float32)
    y = conv3x3_pack2(
        x, pack_weights(w), jnp.asarray(scale), jnp.asarray(bias),
        relu=relu, interpret=True,
    )
    ref = conv3x3_pack2_reference(x, w, scale, bias, relu=relu)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4)


def test_packed_conv_no_epilogue():
    rng = np.random.default_rng(1)
    B, H, W, C = 1, 4, 8, 48
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    w = rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.1
    y = conv3x3_pack2(x, pack_weights(w), interpret=True)
    ref = conv3x3_pack2_reference(x, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4)

"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on a virtual CPU mesh
(``xla_force_host_platform_device_count=8``) since only one real TPU chip is
available; the driver's ``dryrun_multichip`` does the same independently.
"""

import os

# The harness pre-sets JAX_PLATFORMS=axon (the tunnelled TPU); tests must
# run on the virtual CPU mesh. The axon plugin overrides the env var, so the
# config flag must be set too, right after import.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

if os.environ.get("SHAPY_TPU_TEST_ON_TPU", "0") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA compiles of the big graphs (HRNet
# forward/backward) dominate suite runtime on this single-core host; the
# cache survives across processes and cuts repeat runs by minutes.
# Keyed per-(host, CPU-feature-signature) so CPU AOT artifacts compiled
# on one machine/microarch are never loaded on another (SIGILL risk).
# The residual "+prefer-no-scatter not supported" warning is XLA's benign
# pseudo-feature mismatch (it fires even for a cache written seconds
# earlier on the same host).
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from shapy_tpu.utils.compile_cache import setup_compile_cache  # noqa: E402

setup_compile_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)


@pytest.fixture(scope="session")
def smplx_data():
    from shapy_tpu.models.body import make_synthetic_model_data

    return make_synthetic_model_data("smplx", subdivisions=2, seed=0)


@pytest.fixture(scope="session")
def smpl_data():
    from shapy_tpu.models.body import make_synthetic_model_data

    return make_synthetic_model_data("smpl", subdivisions=2, seed=1)

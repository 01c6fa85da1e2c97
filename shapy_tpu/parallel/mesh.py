"""Device mesh and sharding rules.

The reference's distributed story is torch.distributed process groups used
only to gate logging and SyncBN (evaluate.py:68-105; no DDP wrap, no
DistributedSampler — SURVEY §2.8). The TPU-native replacement:

  * one ``jax.sharding.Mesh`` with axes ``('data', 'model')``;
  * batch tensors sharded over ``data`` (pure data parallelism — the SHAPY
    model is ~80M params, so DP is the right decomposition; the ``model``
    axis exists for FSDP-style parameter sharding of the large head/conv
    kernels when scaling past one pod slice);
  * metric reductions become global-mean jnp reductions under jit — GSPMD
    inserts the psum; no rank-0 funnel;
  * SyncBN falls out for free: batch statistics computed inside a
    batch-sharded jit are global statistics.

``jax.distributed.initialize`` replaces ``init_process_group`` for
multi-host (DCN) runs.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(**kwargs) -> None:
    """Multi-host runtime init (no-op when single-process)."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        # Already initialised or single-process — both fine.
        pass


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh with ('data', 'model') axes. Defaults to all devices on data."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Parameters that must stay replicated regardless of shape: batch-norm
# statistics/affines feed cross-batch reductions, and the body model's
# template/blend assets are gathered with data-dependent indices (a
# 'model'-sharded gather would force an all-gather anyway).
_REPLICATE_MARKERS = ("bn", "norm", "running_", "shapedirs", "posedirs",
                     "v_template", "lbs_weights")


def _param_spec(path: str, shape, model_axis_size: int) -> P:
    """FSDP-style rule, keyed on both the parameter name and its shape.

    * anything matching ``_REPLICATE_MARKERS`` is replicated (see above);
    * 4D conv kernels (HWIO) shard their output-channel axis when it
      divides the axis size and is large enough to matter — out-channels
      is the contraction-free axis, so the forward all-gather rides a
      single axis and the backward reduce-scatter matches the grad
      layout;
    * other big 2D+ tensors shard their largest divisible axis;
    * everything else is replicated. Conservative thresholds keep small
      tensors whole (an all-gather of a 48-channel kernel costs more
      than it saves).
    """
    if model_axis_size <= 1 or len(shape) < 2:
        return P()
    lname = path.lower()
    if any(m in lname for m in _REPLICATE_MARKERS):
        return P()
    if len(shape) == 4 and shape[-1] >= 256 and (
            shape[-1] % model_axis_size == 0):
        return P(None, None, None, "model")
    largest = int(np.argmax(shape))
    if shape[largest] >= 1024 and shape[largest] % model_axis_size == 0:
        spec = [None] * len(shape)
        spec[largest] = "model"
        return P(*spec)
    return P()


def shard_params(params, mesh: Mesh):
    """Place a param pytree on the mesh with the FSDP rule above."""
    model_size = mesh.shape["model"]

    def place(path, leaf):
        name = "/".join(str(p) for p in path)
        spec = _param_spec(name, np.shape(leaf), model_size)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(batch, mesh: Mesh):
    """Place batch arrays with leading-axis data sharding."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)

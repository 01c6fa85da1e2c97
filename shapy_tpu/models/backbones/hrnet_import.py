"""Torch-checkpoint import for the HRNet backbone.

Because :mod:`shapy_tpu.models.backbones.hrnet` names its parameters with
the exact reference ``state_dict`` keys, importing the shipped checkpoints
(ImageNet-pretrained ``hrnetv2_w48_imagenet_pretrained.pth`` or the full
SHAPY checkpoint's ``backbone.*`` subtree) reduces to:

  * transpose conv kernels OIHW -> HWIO,
  * drop ``num_batches_tracked`` counters,
  * (optionally) filter by the reference's ``pretrained_layers`` prefix
    list (hrnet.py:518-534).
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import jax.numpy as jnp
import numpy as np


def import_hrnet_state_dict(
    state_dict: Dict[str, np.ndarray],
    prefix: str = "",
    pretrained_layers: Optional[Iterable[str]] = ("*",),
    dtype=jnp.float32,
) -> Dict[str, jnp.ndarray]:
    """Convert a torch state dict into an hrnet_forward param dict.

    Args:
      state_dict: name -> numpy array (already detached, see
        ``shapy_tpu.io.torch_import``).
      prefix: strip this prefix (e.g. ``"backbone."`` when slicing the full
        SHAPY model checkpoint).
      pretrained_layers: keep only keys whose first component is in this
        list ('*' keeps everything).
    """
    layers = list(pretrained_layers or ["*"])
    out: Dict[str, jnp.ndarray] = {}
    for name, value in state_dict.items():
        if prefix:
            if not name.startswith(prefix):
                continue
            name = name[len(prefix):]
        if name.endswith("num_batches_tracked"):
            continue
        if layers[0] != "*" and name.split(".")[0] not in layers:
            continue
        arr = np.asarray(value)
        if name.endswith(".weight") and arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        out[name] = jnp.asarray(arr, dtype=dtype)
    return out


def load_hrnet_checkpoint(path: str, prefix: str = "", **kwargs):
    from shapy_tpu.io.torch_import import load_torch_file, state_dict_to_numpy

    obj = load_torch_file(path)
    sd = state_dict_to_numpy(obj)
    return import_hrnet_state_dict(sd, prefix=prefix, **kwargs)

"""Import the reference's full SHAPY model checkpoint.

The released SHAPY_A checkpoint is a regressor ``Checkpointer`` torch file
(``{'model': state_dict, ...}``, utils/checkpointer.py) whose state dict
contains:

  backbone.*                 -> HRNet params (transpose OIHW -> HWIO)
  regressor.module.*         -> iterative-head MLP (layer_{i:03d}.0.*,
                                output_layer.*) — torch Linear weights used
                                as-is (we store (out, in) like torch)
  regressor.mean_param       -> the concatenated parameter mean
  model.* / body_measurements.* -> body-model constants (already provided
                                by the SMPL-X assets; skipped)
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from shapy_tpu.io.torch_import import load_torch_file, state_dict_to_numpy
from shapy_tpu.models.backbones.hrnet_import import import_hrnet_state_dict


def load_reference_model_checkpoint(
    path: str,
    params_template: Dict[str, Any],
    dtype=jnp.float32,
) -> Dict[str, Any]:
    obj = load_torch_file(path)
    sd = state_dict_to_numpy(obj)

    backbone_sd = {
        k[len("backbone."):]: v for k, v in sd.items()
        if k.startswith("backbone.")
    }
    backbone = import_hrnet_state_dict(backbone_sd, dtype=dtype)

    head: Dict[str, jnp.ndarray] = {}
    prefix = "regressor.module."
    for k, v in sd.items():
        if k.startswith(prefix):
            head[k[len(prefix):]] = jnp.asarray(v, dtype=dtype)

    out = dict(params_template)
    missing_backbone = set(params_template["backbone"]) - set(backbone)
    if backbone:
        if missing_backbone:
            merged = dict(params_template["backbone"])
            merged.update(backbone)
            out["backbone"] = merged
        else:
            out["backbone"] = backbone
    if head:
        merged_head = dict(params_template["head"])
        merged_head.update(
            {k: v for k, v in head.items() if k in merged_head}
        )
        out["head"] = merged_head
    if "regressor.mean_param" in sd:
        out["param_mean"] = jnp.asarray(
            sd["regressor.mean_param"], dtype=dtype
        ).reshape(1, -1)
    return out

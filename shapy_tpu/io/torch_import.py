"""Importers for the reference's released PyTorch checkpoints.

Three on-disk formats exist in the reference ecosystem (SURVEY-identified):

  1. plain ``torch.save`` dicts with ``latest_checkpoint`` pointer files
     (regressor ``Checkpointer``, utils/checkpointer.py:11-124),
  2. PyTorch-Lightning ``.ckpt`` dicts with ``state_dict`` +
     ``hyper_parameters`` (A2B / B2A attribute models),
  3. joblib pickles (attribute demo data, dataset DBs).

This module reads any of them on the host and converts tensors to numpy;
model-specific key-mapping lives next to each model (e.g.
``shapy_tpu.models.backbones.hrnet_import``).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _to_numpy(obj: Any) -> Any:
    try:
        import torch

        if isinstance(obj, torch.Tensor):
            # .copy() severs the view into torch-owned memory — jnp.asarray
            # on CPU may otherwise zero-copy alias a buffer torch can
            # mutate in place.
            return obj.detach().cpu().numpy().copy()
    except ImportError:
        pass
    if isinstance(obj, dict):
        return {k: _to_numpy(v) for k, v in obj.items()}
    if isinstance(obj, tuple) and hasattr(obj, "_fields"):
        # namedtuple: the constructor takes positional fields, not an
        # iterable (Lightning hparams / optimizer states contain these)
        return type(obj)(*(_to_numpy(v) for v in obj))
    if isinstance(obj, (list, tuple)):
        return type(obj)(_to_numpy(v) for v in obj)
    return obj


def load_torch_file(path: str) -> Any:
    """Load a torch / joblib / pickle file into plain numpy structures."""
    import pickle

    try:
        import torch

        try:
            obj = torch.load(path, map_location="cpu", weights_only=False)
            return _to_numpy(obj)
        except (pickle.UnpicklingError, RuntimeError, EOFError):
            pass
    except ImportError:
        pass
    try:
        import joblib

        return _to_numpy(joblib.load(path))
    except Exception:
        with open(path, "rb") as f:
            return _to_numpy(pickle.load(f, encoding="latin1"))


def state_dict_to_numpy(obj: Any) -> Dict[str, np.ndarray]:
    """Extract a flat param-name -> numpy dict from a loaded checkpoint.

    Handles Lightning (``state_dict`` key), the regressor Checkpointer
    (``model`` key), and raw state dicts.
    """
    if isinstance(obj, dict):
        for key in ("state_dict", "model"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    return {k: np.asarray(v) for k, v in obj.items()
            if isinstance(v, np.ndarray)}

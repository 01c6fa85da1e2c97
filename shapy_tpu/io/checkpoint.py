"""Checkpoint save/load with pointer files.

Behavioural spec: reference ``regressor/human_shape/utils/
checkpointer.py:11-124``: torch.save dicts {model, optimizer, scheduler,
iteration, epoch_number}, ``latest_checkpoint`` / ``best_checkpoint``
pointer files, fallback to a pretrained directory, non-strict load with
missing/unexpected-key logging.

Implemented over orbax (the TPU-native checkpoint stack: async-capable,
sharding-aware) with the same pointer-file protocol on top, plus import of
the reference's torch checkpoints via :mod:`shapy_tpu.io.torch_import`.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax

from shapy_tpu.utils.logging import get_logger

logger = get_logger(__name__)

LATEST_POINTER = "latest_checkpoint"
BEST_POINTER = "best_checkpoint"


class Checkpointer:
    def __init__(
        self,
        save_dir: str = "checkpoints",
        pretrained: str = "",
    ):
        self.save_dir = os.path.abspath(
            os.path.expanduser(os.path.expandvars(save_dir))
        )
        self.pretrained = os.path.expanduser(os.path.expandvars(pretrained))
        os.makedirs(self.save_dir, exist_ok=True)
        import orbax.checkpoint as ocp

        self._ckptr = ocp.StandardCheckpointer()

    # -- pointers ----------------------------------------------------------
    def _write_pointer(self, pointer: str, path: str) -> None:
        with open(os.path.join(self.save_dir, pointer), "w") as f:
            f.write(path)

    def _read_pointer(self, pointer: str) -> Optional[str]:
        p = os.path.join(self.save_dir, pointer)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            path = f.read().strip()
        return path if path and os.path.exists(path) else None

    # -- save / load -------------------------------------------------------
    def save(
        self,
        state: Dict[str, Any],
        step: int,
        is_best: bool = False,
    ) -> str:
        path = os.path.join(self.save_dir, f"ckpt_{step:08d}")
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        self._write_pointer(LATEST_POINTER, path)
        if is_best:
            self._write_pointer(BEST_POINTER, path)
        logger.info("Saved checkpoint %s", path)
        return path

    def load(
        self,
        template: Optional[Dict[str, Any]] = None,
        path: Optional[str] = None,
        use_best: bool = False,
    ) -> Optional[Dict[str, Any]]:
        """Resolve order: explicit path -> best/latest pointer ->
        pretrained dir (checkpointer.py:57-90)."""
        if path is None:
            path = self._read_pointer(
                BEST_POINTER if use_best else LATEST_POINTER
            )
        if path is None and self.pretrained and os.path.isdir(
                self.pretrained):
            sub = Checkpointer(self.pretrained)
            path = sub._read_pointer(BEST_POINTER) or sub._read_pointer(
                LATEST_POINTER
            )
            if path is None:
                cands = sorted(
                    d for d in os.listdir(self.pretrained)
                    if d.startswith("ckpt_")
                )
                if cands:
                    path = os.path.join(self.pretrained, cands[-1])
        if path is None:
            logger.info("No checkpoint found in %s", self.save_dir)
            return None
        logger.info("Loading checkpoint %s", path)
        if template is not None:
            return self._ckptr.restore(path, template)
        return self._ckptr.restore(path)


def merge_loaded_params(
    params: Dict[str, Any],
    loaded: Dict[str, Any],
    strict: bool = False,
) -> Dict[str, Any]:
    """Non-strict merge of a loaded flat-or-nested param tree into an
    existing one, logging missing/unexpected keys
    (checkpointer.py:91-99)."""
    flat_params = dict(
        jax.tree_util.tree_flatten_with_path(params)[0]
    )
    flat_loaded = dict(
        jax.tree_util.tree_flatten_with_path(loaded)[0]
    )
    missing = [k for k in flat_params if k not in flat_loaded]
    unexpected = [k for k in flat_loaded if k not in flat_params]
    if missing:
        logger.warning("Missing keys in checkpoint: %d", len(missing))
    if unexpected:
        logger.warning("Unexpected keys in checkpoint: %d", len(unexpected))
    if strict and (missing or unexpected):
        raise KeyError(
            f"Strict load failed: {len(missing)} missing, "
            f"{len(unexpected)} unexpected"
        )

    def merge(path, leaf):
        return flat_loaded.get(path, leaf)

    return jax.tree_util.tree_map_with_path(merge, params)

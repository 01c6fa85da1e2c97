"""Training orchestration.

The reference ships no public training entry point — its losses,
optimizers, samplers, and SyncBN config exist as library code only
(SURVEY §1: "There is no public training entry point for the regressor").
This Trainer completes the capability: mixed pose+shape streams, the
jitted (optionally mesh-sharded) train step, periodic checkpointing via
orbax, and periodic evaluation.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from shapy_tpu.train.step import (
    TrainState,
    build_optimizer,
    init_train_state,
    make_train_step,
)
from shapy_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def _to_device_batch(batch: Dict[str, Any], mesh=None) -> Dict:
    """numpy collate output -> jit-ready arrays (drop host-only fields)."""
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.dtype != object:
            out[k] = jnp.asarray(v)
    if mesh is not None:
        from shapy_tpu.parallel import shard_batch

        out = shard_batch(out, mesh)
    return out


class Trainer:
    def __init__(
        self,
        regressor,
        losses,
        optim_cfg: Optional[Dict] = None,
        checkpointer=None,
        mesh=None,
        summary_steps: int = 100,
        checkpoint_steps: int = 1000,
        max_duration: float = float("inf"),
    ):
        self.regressor = regressor
        self.losses = losses
        self.tx = build_optimizer(optim_cfg)
        self.checkpointer = checkpointer
        self.mesh = mesh
        self.summary_steps = summary_steps
        self.checkpoint_steps = checkpoint_steps
        self.max_duration = max_duration

        state = init_train_state(regressor, self.tx)
        if mesh is not None:
            from shapy_tpu.parallel import shard_params

            params = shard_params(state.params, mesh)
            state = TrainState(
                params=params,
                opt_state=self.tx.init(params),
                step=state.step,
            )
        self.state = state
        # Donate the TrainState: params + opt_state (~840 MB for the
        # flagship) are consumed and rebuilt every step; donation lets
        # XLA update them in place instead of allocating a second copy.
        self.step_fn = jax.jit(
            make_train_step(regressor, losses, self.tx),
            donate_argnums=(0,),
        )
        # Frozen body-model constants as a jit ARGUMENT — closure capture
        # would embed ~100 MB of blend shapes into the serialized HLO
        # (slow compiles; overflows the dev tunnel's compile request at
        # batch 256). Same arrays every call -> no retracing.
        model = getattr(regressor, "model", None)
        self.model_consts = model.params if model is not None else None

    def resume(self) -> None:
        if self.checkpointer is None:
            return
        loaded = self.checkpointer.load(template={
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        })
        if loaded is not None:
            self.state = TrainState(**loaded)
            logger.info("Resumed from step %d", int(self.state.step))

    def fit(
        self,
        loaders: Dict[str, Any],
        num_steps: int,
        rng: Optional[jax.Array] = None,
        eval_fn=None,
        eval_steps: int = 0,
    ) -> Dict[str, float]:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        iters = {k: iter(v) for k, v in loaders.items()}
        start_time = time.time()
        last_metrics: Dict[str, float] = {}

        step0 = int(self.state.step)
        for step in range(step0, step0 + num_steps):
            merged: Optional[Dict] = None
            for part, loader in loaders.items():
                try:
                    batch = next(iters[part])
                except StopIteration:
                    iters[part] = iter(loader)
                    batch = next(iters[part])
                db = _to_device_batch(batch, self.mesh)
                if merged is None:
                    merged = db
                else:
                    # Concatenate pose + shape streams along batch
                    common = set(merged) & set(db)
                    merged = {
                        k: jnp.concatenate([merged[k], db[k]])
                        for k in common
                    }
            if merged is None:
                raise ValueError("No batches produced by the loaders")

            images = merged.pop("images")
            rng, sub = jax.random.split(rng)
            self.state, metrics = self.step_fn(
                self.state, images, merged, sub, self.model_consts
            )

            if (step + 1) % self.summary_steps == 0:
                last_metrics = {
                    k: float(v) for k, v in metrics.items()
                }
                logger.info(
                    "step %d: %s", step + 1,
                    {k: round(v, 4) for k, v in last_metrics.items()},
                )
            if (
                self.checkpointer is not None
                and (step + 1) % self.checkpoint_steps == 0
            ):
                self.checkpointer.save(
                    {
                        "params": self.state.params,
                        "opt_state": self.state.opt_state,
                        "step": self.state.step,
                    },
                    step=step + 1,
                )
            if eval_fn is not None and eval_steps and \
                    (step + 1) % eval_steps == 0:
                eval_fn(self.state)
            if time.time() - start_time > self.max_duration:
                logger.info("Max duration reached at step %d", step + 1)
                break
        return last_metrics

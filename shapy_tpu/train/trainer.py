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
    make_adversarial_train_step,
    make_train_step,
)
from shapy_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def _stream_from(loader, start: int):
    """Deterministic infinite batch stream positioned at global batch
    index ``start``. Replays the epoch sequence a fresh run would have
    produced — burned epochs advance the sampler's stateful shuffle rng
    without fetching, the partial epoch is skipped at the sampler level
    (DataLoader.iter_batches) — so training resumed at step N sees
    exactly the batches steps N, N+1, ... of an uninterrupted run."""
    try:
        epoch_len = len(loader)
    except TypeError:
        epoch_len = 0
    sampler = getattr(loader, "batch_sampler", None)
    can_skip = hasattr(loader, "iter_batches") and sampler is not None
    if start and epoch_len and can_skip:
        epochs, offset = divmod(start, epoch_len)
        for _ in range(epochs):
            for _ in iter(sampler):
                pass
        it = loader.iter_batches(skip=offset)
    else:
        it = iter(loader)
    while True:
        try:
            yield next(it)
        except StopIteration:
            it = iter(loader)
            # A loader that yields nothing even from a fresh epoch
            # (dataset smaller than the batch with drop_last, or every
            # sample skipped as corrupt) must surface as an error, not a
            # silent busy loop re-creating empty iterators forever.
            try:
                yield next(it)
            except StopIteration:
                raise ValueError(
                    "data loader produced no batches (empty dataset or "
                    "batch size larger than the dataset with drop_last)"
                ) from None


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


def merge_stream_batches(batches) -> Dict[str, jnp.ndarray]:
    """Concatenate the per-part (pose / shape) device batches along the
    batch axis over the key UNION.

    A stream missing a supervision key contributes zeros for it, which
    is exactly the collate's own missing-sample convention (zero
    confidence / zero ``*_valid`` rows are ignored by the losses). An
    intersection would silently drop each stream's exclusive
    supervision — e.g. the shape stream's ``gt_measurements`` or the
    pose stream's ``gt_body_pose``. Every batch must carry ``images``
    (the collate guarantees it), which provides the fill batch size.
    """
    merged: Optional[Dict] = None
    for db in batches:
        if merged is None:
            merged = dict(db)
            continue

        def _fill(d, k, other):
            if k in d:
                return d[k]
            ref = other[k]
            b = d["images"].shape[0]
            return jnp.zeros((b,) + ref.shape[1:], ref.dtype)

        merged = {
            k: jnp.concatenate(
                [_fill(merged, k, db), _fill(db, k, merged)]
            )
            for k in set(merged) | set(db)
        }
    if merged is None:
        raise ValueError("No batches produced by the loaders")
    return merged


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
        use_adv_training: bool = False,
        disc_cfg: Optional[Dict] = None,
        adv_loss_cfg: Optional[Dict] = None,
        disc_optim_cfg: Optional[Dict] = None,
    ):
        self.regressor = regressor
        self.losses = losses
        self.tx = build_optimizer(optim_cfg)
        self.checkpointer = checkpointer
        self.mesh = mesh
        self.summary_steps = summary_steps
        self.checkpoint_steps = checkpoint_steps
        self.max_duration = max_duration
        self.use_adv_training = bool(use_adv_training)

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
        if self.use_adv_training:
            # The surface the reference declares and stubs out
            # (models/build.py:26-31 NotImplementedError): discriminator
            # from network.discriminator, GAN loss from
            # losses.discriminator, its optimizer from
            # optim.discriminator (optim_defaults.py:59).
            from shapy_tpu.losses.adversarial import build_adv_loss
            from shapy_tpu.models.discriminator import build_discriminator

            self.disc = build_discriminator(disc_cfg)
            self.adv_loss = build_adv_loss(
                lambda p, x: self.disc.apply(p, x)[0], adv_loss_cfg
            )
            self.tx_disc = build_optimizer(disc_optim_cfg or optim_cfg)
            disc_params = jax.tree_util.tree_map(
                jnp.copy, self.disc.params)
            if mesh is not None:
                from shapy_tpu.parallel.mesh import replicated

                disc_params = jax.device_put(
                    disc_params, replicated(mesh))
            self.disc_state = TrainState(
                params=disc_params,
                opt_state=self.tx_disc.init(disc_params),
                step=jnp.asarray(0, jnp.int32),
            )
            self.step_fn = jax.jit(
                make_adversarial_train_step(
                    regressor, losses, self.adv_loss, self.disc,
                    self.tx, self.tx_disc,
                ),
                donate_argnums=(0, 1),
            )
        else:
            self.disc_state = None
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

    def _ckpt_tree(self) -> Dict[str, Any]:
        tree = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        if self.disc_state is not None:
            tree["disc"] = {
                "params": self.disc_state.params,
                "opt_state": self.disc_state.opt_state,
                "step": self.disc_state.step,
            }
        return tree

    def resume(self) -> None:
        if self.checkpointer is None:
            return
        loaded = self.checkpointer.load(template=self._ckpt_tree())
        if loaded is not None:
            disc = loaded.pop("disc", None)
            self.state = TrainState(**loaded)
            if disc is not None and self.disc_state is not None:
                self.disc_state = TrainState(**disc)
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
        start_time = time.time()
        last_metrics: Dict[str, float] = {}

        step0 = int(self.state.step)
        # Position every stream at the global step and derive the
        # per-step rng by fold_in: both are pure functions of the step
        # index, which makes kill+resume bit-identical to an
        # uninterrupted run (same batches, same dropout/GAN noise).
        streams = {k: _stream_from(v, step0) for k, v in loaders.items()}
        for step in range(step0, step0 + num_steps):
            merged = merge_stream_batches(
                _to_device_batch(next(streams[part]), self.mesh)
                for part in loaders
            )

            images = merged.pop("images")
            sub = jax.random.fold_in(rng, step)
            if self.use_adv_training:
                # Real pose samples for the discriminator: an explicit
                # real_body_pose stream if the loader provides one, else
                # the batch's own GT rotations (HMR uses a mocap prior
                # dataset; any GT-pose dataset plays that role here).
                if "real_body_pose" not in merged:
                    if "gt_body_pose" not in merged:
                        raise ValueError(
                            "use_adv_training needs real_body_pose or "
                            "gt_body_pose in the batch (a dataset with "
                            "GT pose rotations)"
                        )
                    merged["real_body_pose"] = merged["gt_body_pose"]
                self.state, self.disc_state, metrics = self.step_fn(
                    self.state, self.disc_state, images, merged, sub,
                    self.model_consts,
                )
            else:
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
                self.checkpointer.save(self._ckpt_tree(), step=step + 1)
            if eval_fn is not None and eval_steps and \
                    (step + 1) % eval_steps == 0:
                eval_fn(self.state, step + 1)
            if time.time() - start_time > self.max_duration:
                logger.info("Max duration reached at step %d", step + 1)
                break
        return last_metrics

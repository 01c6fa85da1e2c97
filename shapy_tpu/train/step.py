"""Optimizer construction and the pjit-able training step.

Behavioural spec: reference ``regressor/human_shape/optimizers/
build.py:14-86`` (Adam/SGD + multi-step/exponential LR schedules). The
training loop itself is new capability — the reference ships the losses,
optimizers and samplers but no public train entry point (SURVEY §1 layer
3.7); here the train step is a single pure function jitted over the mesh:

  state, metrics = train_step(state, batch, rng)

with the batch sharded over the 'data' axis and parameters FSDP-sharded
over 'model' (see :mod:`shapy_tpu.parallel.mesh`). Gradient averaging and
SyncBN fall out of GSPMD — no explicit collectives.

BatchNorm running statistics are part of ``state.params['backbone']`` and
are updated functionally from the forward pass's stat updates (torch
mutates module buffers; here the updates flow through the state).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import chex
import jax
import jax.numpy as jnp
import optax


@chex.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def _bias_mask(params):
    """True for parameters whose name contains 'bias' — the reference's
    per-group predicate (optimizers/build.py:27-29)."""
    def label(path, _leaf):
        name = "/".join(
            str(getattr(p, "key", getattr(p, "name", p))) for p in path
        )
        return "bias" in name

    return jax.tree_util.tree_map_with_path(label, params)


def _not_bias_mask(params):
    return jax.tree_util.tree_map(lambda b: not b, _bias_mask(params))


def build_optimizer(optim_cfg: Optional[Dict] = None) -> optax.GradientTransformation:
    """Adam / AdamW / SGD / RMSprop + step / multi-step / exponential
    schedules, with the reference's per-group bias treatment
    (optimizers/build.py:14-86: bias params get lr * bias_lr_factor and
    weight_decay_bias instead of weight_decay)."""
    cfg = dict(optim_cfg or {})
    lr = float(cfg.get("lr", 1e-4))
    # None = unset (lets adamw fall back to the torch AdamW default);
    # an explicit 0.0 stays 0.0.
    weight_decay_cfg = cfg.get("weight_decay", None)
    weight_decay = float(weight_decay_cfg or 0.0)
    weight_decay_bias = float(cfg.get("weight_decay_bias", 0.0))
    bias_lr_factor = float(cfg.get("bias_lr_factor", 1.0))
    sched_cfg = dict(cfg.get("scheduler") or {})
    sched_type = sched_cfg.get("type", "none")

    if sched_type == "multi-step-lr":
        gamma = float(sched_cfg.get("gamma", 0.1))
        milestones = list(sched_cfg.get("milestones", []))
        schedule = optax.piecewise_constant_schedule(
            lr, {int(m): gamma for m in milestones}
        )
    elif sched_type == "step-lr":
        schedule = optax.exponential_decay(
            lr, int(sched_cfg.get("step_size", 1000)),
            float(sched_cfg.get("gamma", 0.1)), staircase=True,
        )
    elif sched_type in ("exp", "exponential"):
        schedule = optax.exponential_decay(
            lr, int(sched_cfg.get("decay_steps", 1000)),
            float(sched_cfg.get("gamma", 0.99)),
        )
    else:
        schedule = lr

    opt_type = cfg.get("type", "adam")
    decoupled = opt_type == "adamw"
    if opt_type in ("adam", "adamw"):
        adam_cfg = dict(cfg.get("adam") or {})
        betas = adam_cfg.get("betas", (0.9, 0.999))
        eps = float(adam_cfg.get("eps", 1e-8))
        core = optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps)
        if decoupled and weight_decay_cfg is None:
            # the reference forwards optim_cfg.adam to torch AdamW,
            # whose default decay is 1e-2 when unspecified
            weight_decay = float(adam_cfg.get("weight_decay", 1e-2))
    elif opt_type == "sgd":
        sgd_cfg = dict(cfg.get("sgd") or {})
        core = optax.trace(
            decay=float(sgd_cfg.get("momentum", 0.9)),
            nesterov=bool(sgd_cfg.get("nesterov", False)),
        )
    elif opt_type == "rmsprop":
        rms_cfg = dict(cfg.get("rmsprop") or {})
        # eps OUTSIDE the sqrt, matching torch.optim.RMSprop
        # (optax's default is inside).
        core = optax.scale_by_rms(
            decay=float(rms_cfg.get("alpha", 0.99)),
            eps=float(rms_cfg.get("eps", 1e-8)),
            eps_in_sqrt=False,
        )
        momentum = float(rms_cfg.get("momentum", 0.0))
        if momentum > 0:
            core = optax.chain(core, optax.trace(decay=momentum))
    else:
        raise ValueError(f"Unknown optimizer type: {opt_type}")

    # Per-group decay, placed to match torch semantics: COUPLED (L2 on
    # the gradient, before the optimizer core) for adam/sgd/rmsprop;
    # DECOUPLED (subtracted from the update after the core, AdamW-style)
    # for adamw. The reference passes weight_decay to the torch
    # optimizers per group, which have exactly these semantics.
    decays = []
    if weight_decay > 0:
        decays.append(
            optax.masked(optax.add_decayed_weights(weight_decay),
                         _not_bias_mask)
        )
    if weight_decay_bias > 0:
        decays.append(
            optax.masked(optax.add_decayed_weights(weight_decay_bias),
                         _bias_mask)
        )

    chain = ([core] + decays) if decoupled else (decays + [core])
    chain.append(optax.scale_by_learning_rate(schedule))
    # lr * bias_lr_factor for bias params == scaling their update.
    if bias_lr_factor != 1.0:
        chain.append(
            optax.masked(optax.scale(bias_lr_factor), _bias_mask)
        )
    return optax.chain(*chain)


def is_batch_stat(path_str: str) -> bool:
    return path_str.endswith("running_mean") or path_str.endswith(
        "running_var"
    )


def make_train_step(
    regressor,
    losses,
    tx: optax.GradientTransformation,
    learn_mean: bool = False,
) -> Callable:
    """Build the pure train-step function.

    The returned function has signature
    ``(state, images, batch, rng) -> (state, metrics)`` and is safe to jit
    (optionally with in/out shardings).
    """
    def step(state: TrainState, images, batch, rng, model_consts=None
             ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """``model_consts``: the frozen body-model param pytree, passed
        as a jit argument so its ~100 MB of blend shapes are NOT
        embedded into the serialized HLO as literals (see
        BodyRegressor.apply's model_params note). stop_gradient'd — the
        backward pass prunes it."""
        if model_consts is not None:
            model_consts = jax.lax.stop_gradient(model_consts)

        def compute(params):
            out, stat_updates = forward_with_stats(
                regressor, params, images, batch, rng,
                model_params=model_consts,
            )
            loss_dict = losses(out, batch)
            return loss_dict["total"], (loss_dict, stat_updates)

        grads, (loss_dict, stat_updates) = jax.grad(
            compute, has_aux=True
        )(state.params)

        # Do not apply gradient updates to BN running stats (replaced by
        # the forward pass's own updates) nor to the parameter mean (a
        # buffer in the reference unless learn_mean, networks.py:513-518).
        def zero_stats(path, g):
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            if is_batch_stat(str(name)):
                return jnp.zeros_like(g)
            if not learn_mean and "param_mean" in str(name):
                return jnp.zeros_like(g)
            return g

        grads = jax.tree_util.tree_map_with_path(zero_stats, grads)

        updates, new_opt_state = tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        backbone = dict(new_params["backbone"])
        backbone.update(stat_updates)
        new_params = {**new_params, "backbone": backbone}

        metrics = {k: v for k, v in loss_dict.items()}
        return (
            TrainState(
                params=new_params,
                opt_state=new_opt_state,
                step=state.step + 1,
            ),
            metrics,
        )

    return step


def forward_with_stats(regressor, params, images, batch, rng,
                       model_params=None):
    """Run the regressor forward in train mode, returning (out,
    batch-stat updates) functionally."""
    from shapy_tpu.models.backbones.layers import ParamStore

    store = ParamStore(dict(params["backbone"]))
    # compute_features consults the store when provided
    out = regressor.apply(
        {**params, "backbone": store.params},
        images,
        batch=batch,
        train=True,
        rng=rng,
        backbone_store=store,
        model_params=model_params,
    )
    return out, store.stat_updates


def init_train_state(regressor, tx) -> TrainState:
    # COPY the parameter arrays: the Trainer jits the step with
    # donate_argnums=(0,), and donating buffers that alias
    # regressor.params would invalidate the regressor's own arrays on
    # real devices after the first step (CPU ignores donation, so tests
    # would never catch it).
    params = jax.tree_util.tree_map(jnp.copy, regressor.params)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.asarray(0, jnp.int32),
    )


def make_adversarial_train_step(
    regressor,
    losses,
    adv_loss,
    disc,
    tx,
    tx_disc,
    learn_mean: bool = False,
    pose_key: str = "body_pose",
):
    """Adversarial training step — capability the reference declares but
    never implements (models/build.py:26-31 raises NotImplementedError
    for ``use_adv_training``; the discriminator, GAN losses, and
    discriminator-optimizer builders all ship unused).

    One call does both updates, HMR-style:

      1. generator (regressor): task losses + ``adv_loss.generator_loss``
         on the last stage's decoded ``pose_key`` rotations;
      2. discriminator: ``adv_loss.discriminator_loss`` on (predicted,
         ``batch['real_body_pose']``) rotations, with spectral-norm
         power-iteration ``u`` buffers refreshed functionally (like BN
         stats) and excluded from gradient updates.

    Returns ``step(state, disc_state, images, batch, rng[, model_consts])
    -> (state, disc_state, metrics)``; jit/shard like make_train_step
    (``model_consts`` plays the same frozen-body-model-as-jit-argument
    role as in the plain step).
    """

    def step(state: TrainState, disc_state: TrainState, images, batch, rng,
             model_consts=None):
        if model_consts is not None:
            model_consts = jax.lax.stop_gradient(model_consts)
        rng, gp_rng = jax.random.split(rng)

        # -- generator update ------------------------------------------
        def gen_compute(params):
            out, stat_updates = forward_with_stats(
                regressor, params, images, batch, rng,
                model_params=model_consts,
            )
            loss_dict = losses(out, batch)
            stage = out[f"stage_{regressor.num_stages - 1:02d}"]
            fake = stage[pose_key]
            g_adv = adv_loss.generator_loss(disc_state.params, fake)
            total = loss_dict["total"] + g_adv
            loss_dict = dict(loss_dict, adv_gen=g_adv, total=total)
            return total, (loss_dict, stat_updates,
                           jax.lax.stop_gradient(fake))

        grads, (loss_dict, stat_updates, fake) = jax.grad(
            gen_compute, has_aux=True
        )(state.params)

        def zero_stats(path, g):
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            if is_batch_stat(str(name)):
                return jnp.zeros_like(g)
            if not learn_mean and "param_mean" in str(name):
                return jnp.zeros_like(g)
            return g

        grads = jax.tree_util.tree_map_with_path(zero_stats, grads)
        updates, new_opt_state = tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        backbone = dict(new_params["backbone"])
        backbone.update(stat_updates)
        new_params = {**new_params, "backbone": backbone}

        # -- discriminator update --------------------------------------
        real = batch["real_body_pose"]

        def disc_compute(dparams):
            return adv_loss.discriminator_loss(
                dparams, fake, real, rng=gp_rng)

        (d_loss, d_aux), d_grads = jax.value_and_grad(
            disc_compute, has_aux=True
        )(disc_state.params)
        # power-iteration u estimates are buffers, not parameters
        d_grads = jax.tree_util.tree_map_with_path(
            lambda path, g: (
                jnp.zeros_like(g)
                if str(getattr(path[-1], "key", path[-1])) == "u" else g
            ),
            d_grads,
        )
        d_updates, d_opt_state = tx_disc.update(
            d_grads, disc_state.opt_state, disc_state.params
        )
        d_params = optax.apply_updates(disc_state.params, d_updates)
        # refresh the spectral-norm u buffers at the new weights
        _, u_updates = disc.apply(d_params, fake, train=True)
        d_params = {
            layer: (
                dict(sub, u=u_updates[layer]) if layer in u_updates else sub
            )
            for layer, sub in d_params.items()
        }

        metrics = dict(loss_dict, adv_disc=d_loss)
        for k, v in d_aux.items():
            if jnp.ndim(v) == 0:
                metrics[f"adv_{k}"] = v
        return (
            TrainState(params=new_params, opt_state=new_opt_state,
                       step=state.step + 1),
            TrainState(params=d_params, opt_state=d_opt_state,
                       step=disc_state.step + 1),
            metrics,
        )

    return step

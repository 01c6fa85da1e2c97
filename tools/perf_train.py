"""Train-step perf harness: full fwd+bwd+optimizer step on-chip.

Times the flagship training step (HRNet-W48 + 3-stage head + SMPL-X LBS +
keypoint/shape/measurement losses + Adam) with the chained-fori_loop
methodology from bench.py (per-dispatch tunnel latency cancels out).

Usage: python tools/perf_train.py [batch]
Env:
  TRAIN_BF16=1    backbone compute in bfloat16 (f32 params/BN stats)
  TRAIN_REMAT=stages|convs  jax.checkpoint the HRNet stages (memory
                  option; "convs" saves conv outputs, recomputes only
                  the BN/ReLU elementwise chains)
  TRAIN_FWD_ONLY=1 / TRAIN_MEAS=0 / TRAIN_MEMSTATS=1  decomposition aids

(The chained fori_loop cannot donate buffers — the Trainer's real loop
uses jit(donate_argnums=(0,)) instead.)
"""

import os
import platform
import sys

import numpy as np


def _chained_ms(step_fn, state, images, batch, rng, mconsts=None,
                ks=(2, 10), reps=3):
    """One compile (dynamic trip count) — tunnel compiles of the train
    graph cost minutes each."""
    import jax
    import jax.numpy as jnp

    from shapy_tpu.utils.timing import chained_device_ms

    @jax.jit
    def run(state, images, batch, rng, mconsts, k):
        def body(i, carry):
            st, acc = carry
            st, metrics = step_fn(st, images, batch, rng, mconsts)
            return st, acc + metrics["total"]

        st, acc = jax.lax.fori_loop(
            0, k, body, (state, jax.numpy.zeros(()))
        )
        return acc

    return chained_device_ms(
        lambda *a: run(*a[:-1], jnp.int32(a[-1])),
        (state, images, batch, rng, mconsts), ks=ks, reps=reps,
        verbose=True)


def main():
    cache_dir = os.environ.get(
        "SHAPY_TPU_COMPILE_CACHE",
        f"/tmp/shapy_tpu_xla_cache_{platform.node()}",
    )
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _build_flagship
    from shapy_tpu.train import RegressorLosses, build_optimizer, \
        make_train_step
    from shapy_tpu.train.step import init_train_state

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    regressor = _build_flagship(subdivisions=5)
    if os.environ.get("TRAIN_BF16", "0") == "1":
        regressor.backbone_compute_dtype = jnp.bfloat16
    remat = os.environ.get("TRAIN_REMAT", "none")
    if remat not in ("none", "stages", "convs"):
        sys.exit(f"TRAIN_REMAT must be none|stages|convs, got {remat!r}")
    if remat != "none":
        regressor.backbone_remat = remat
    slice_mode = os.environ.get("TRAIN_SLICE", "")
    if slice_mode:
        if slice_mode not in ("reference", "exact"):
            sys.exit(f"TRAIN_SLICE must be reference|exact, "
                     f"got {slice_mode!r}")
        regressor.body_measurements.slice_mode = slice_mode

    loss_cfg = {
        "body_joints_2d": {"weight": 1.0},
        "shape": {"weight": 1e-3},
        "stages_to_penalize": ["stage_02"],
    }
    if os.environ.get("TRAIN_MEAS", "1") == "1":
        loss_cfg["measurements"] = {"weight": 1.0}
    losses = RegressorLosses({"body": loss_cfg})
    tx = build_optimizer({"type": "adam", "lr": 1e-4})
    state = init_train_state(regressor, tx)

    rng_np = np.random.default_rng(0)
    images = jnp.asarray(
        rng_np.normal(size=(batch_size, 256, 256, 3)).astype(np.float32))
    n_kp = 106
    kp = np.zeros((batch_size, n_kp, 3), np.float32)
    kp[:, :25, :2] = rng_np.uniform(-1, 1, size=(batch_size, 25, 2))
    kp[:, :25, 2] = 1.0
    batch = {
        "target_keypoints2d": jnp.asarray(kp),
        "gender": jnp.asarray(rng_np.integers(0, 3, size=batch_size)),
        "gt_betas": jnp.asarray(
            rng_np.normal(size=(batch_size, 10)).astype(np.float32)),
        "height": jnp.asarray(
            rng_np.uniform(1.5, 1.9, size=batch_size).astype(np.float32)),
        "height_valid": jnp.ones((batch_size,), jnp.float32),
    }
    rng = jax.random.PRNGKey(0)

    if os.environ.get("TRAIN_FWD_ONLY", "0") == "1":
        # forward + loss in train mode, no grad/optimizer — the
        # decomposition baseline for the ledger.
        from shapy_tpu.train.step import forward_with_stats

        def fwd_step(state, images, batch, rng, mconsts=None):
            out, _ = forward_with_stats(
                regressor, state.params, images, batch, rng,
                model_params=mconsts)
            loss_dict = losses(out, batch)
            return state, loss_dict

        step = fwd_step
    else:
        step = make_train_step(regressor, losses, tx)

    mconsts = regressor.model.params

    if os.environ.get("TRAIN_MEMSTATS", "0") == "1":
        import jax as _jax

        st, m = _jax.jit(step)(state, images, batch, rng, mconsts)
        _jax.block_until_ready(m["total"])
        stats = _jax.local_devices()[0].memory_stats() or {}
        for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
            if k in stats:
                print(f"  {k}: {stats[k] / 1e9:.2f} GB", flush=True)

    ms = _chained_ms(step, state, images, batch, rng, mconsts)
    print(
        f"train step batch {batch_size}: {ms:.1f} ms "
        f"({batch_size / ms * 1000:.0f} img/s)  "
        f"bf16={os.environ.get('TRAIN_BF16', '0')} remat={remat} "
        f"slice={slice_mode or 'default'} "
        f"meas={os.environ.get('TRAIN_MEAS', '1')}"
    )


if __name__ == "__main__":
    main()

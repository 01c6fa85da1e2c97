"""Perf ablation: where does the HRNet-W48 forward time go on-chip?

Times cumulative prefixes of the backbone (stem, +stage2, +stage3,
+stage4, +head) and the full regressor with the chained-fori_loop
methodology from bench.py (per-dispatch tunnel latency cancels out),
then prints per-section deltas.

Usage: python tools/perf_ablate.py [batch]
Env: ABLATE_BF16=1 (default) runs the backbone in bfloat16.
"""

import os
import sys
import time

import numpy as np


def _chained_ms(body, params, x0, reps=3, k0=4):
    """Adaptive chained timing.

    Escalates the iteration count until the chained program runs
    ~1.5-3.5 s of wall clock: long enough that per-dispatch tunnel
    jitter (100s of ms) is small relative to the measurement, but
    SHORT enough to stay under the tunnel's ~10 s threshold beyond
    which wall time is inflated (polling backoff), which would
    otherwise overstate per-iteration time by 2-5x."""
    import jax

    def timed(k, nreps):
        @jax.jit
        def run(p, x):
            return jax.lax.fori_loop(0, k, lambda i, x: body(p, x), x)

        r = run(params, x0)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
        times = []
        for _i in range(nreps):
            t0 = time.perf_counter()
            r = run(params, x0)
            _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
            times.append(time.perf_counter() - t0)
        return min(times)

    t0 = timed(k0, reps)
    # One-shot escalation (compiles dominate wall clock on this host):
    # estimate per-iteration time from t0 minus a dispatch-overhead
    # guess, target a ~2.5 s chained program.
    x_est = max((t0 - 0.3) / k0, 2e-4)
    k1 = int(min(max(2.5 / x_est, k0 * 8), 4096))
    t1 = timed(k1, 1)
    if t1 > 5.5:  # overshot into the throttled zone; halve once
        k1 = max(k0 * 8, k1 // 4)
        t1 = timed(k1, 1)
    t1 = min(t1, timed(k1, reps - 1)) if reps > 1 else t1
    return (t1 - t0) / (k1 - k0) * 1000.0


def hrnet_prefix(params, images, upto, old_impl=False):
    """Replicates hrnet_forward up to a named section (tool-only copy)."""
    import jax.numpy as jnp

    from shapy_tpu.models.backbones.hrnet import (
        _branch_channels, _run_block_seq, _stage, _subsample, _transition,
    )
    from shapy_tpu.models.backbones.layers import ParamStore, conv_bn_relu
    from shapy_tpu.models.backbones.hrnet import bottleneck_block

    store = ParamStore(params, fold_bn=True)  # eval path: BN folded
    train, axis_name = False, None
    x = conv_bn_relu(store, "conv1", "bn1", images, 64, 3, 2, 1, train)
    if upto == "conv1":
        return x
    x = conv_bn_relu(store, "conv2", "bn2", x, 64, 3, 2, 1, train)
    if upto == "conv2":
        return x
    x = _run_block_seq(store, "layer1", x, "BOTTLENECK", 64, 4, train,
                       axis_name)
    if upto == "stem":
        return x
    xs = _transition(store, "transition1", [x], [256],
                     _branch_channels("stage2"), train, axis_name)
    xs = _stage(store, "stage2", xs, "stage2", train, axis_name)
    if upto == "stage2":
        return xs[0]
    xs = _transition(store, "transition2", xs, _branch_channels("stage2"),
                     _branch_channels("stage3"), train, axis_name)
    xs = _stage(store, "stage3", xs, "stage3", train, axis_name)
    if upto == "stage3":
        return xs[0]
    xs = _transition(store, "transition3", xs, _branch_channels("stage3"),
                     _branch_channels("stage4"), train, axis_name)
    xs = _stage(store, "stage4", xs, "stage4", train, axis_name)
    if upto == "stage4":
        return xs[0]
    x4 = _subsample(store, "subsample_4", xs[0], 3, train, axis_name)
    x3 = _subsample(store, "subsample_3", xs[1], 2, train, axis_name)
    x2 = _subsample(store, "subsample_2", xs[2], 1, train, axis_name)
    feat = jnp.concatenate([x4, x3, x2, xs[3]], axis=-1)
    for i in range(5):
        feat = bottleneck_block(store, f"conv_layers.{i}", feat, 512, 1,
                                True, train, downsample_has_bn=False)
    return jnp.mean(feat, axis=(1, 2))


def main():
    import platform

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

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    bf16 = os.environ.get("ABLATE_BF16", "1") == "1"
    regressor = _build_flagship(subdivisions=5)
    if bf16:
        regressor.backbone_compute_dtype = jnp.bfloat16

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(batch, 256, 256, 3)).astype(np.float32))

    sections = os.environ.get(
        "ABLATE_SECTIONS", "stem,stage2,stage3,stage4,head,full"
    ).split(",")
    cum = {}
    import jax

    def body_full(p, x):
        out = regressor.apply(p, x)
        last = out[f"stage_{regressor.num_stages - 1:02d}"]
        mix = last["betas"].mean() + out["proj_joints"].mean()
        mix = mix + sum(v.mean() for v in
                        jax.tree_util.tree_leaves(out["measurements"]))
        return x + mix.astype(x.dtype) * 1e-6

    for sec in sections:
        if sec == "full":
            cum[sec] = _chained_ms(body_full, regressor.params, images,
                                   reps=2)
        else:

            def body(p, x, sec=sec):
                xin = x.astype(jnp.bfloat16) if bf16 else x
                out = hrnet_prefix(p["backbone"], xin, sec)
                return x + out.mean().astype(x.dtype) * 1e-6

            cum[sec] = _chained_ms(body, regressor.params, images, reps=2)
        print(f"cumulative {sec:8s}: {cum[sec]:7.2f} ms "
              f"({batch / cum[sec] * 1000:.0f} img/s)", flush=True)

    prev = 0.0
    print("\nper-section:")
    for sec in sections:
        print(f"  {sec:8s}: {cum[sec] - prev:7.2f} ms")
        prev = cum[sec]


if __name__ == "__main__":
    main()

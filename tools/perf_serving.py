"""Serving-artifact overhead probe.

Times the jax.export/StableHLO serving artifact (shapy_tpu/io/export.py)
against the live jit path at the bench shape (flagship, batch 128, bf16
backbone) with the chained-fori device-timing methodology from bench.py.
Three variants:

  live       regressor.apply under jax.jit (the bench.py path)
  fixed      artifact exported at a fixed batch size
  symbolic   artifact exported with a symbolic batch dim, refined to the
             same batch at call time

Expected: all three identical within noise — jax.export round-trips
StableHLO, so XLA compiles the same program; shape polymorphism
specializes at call time and costs nothing at runtime. Run on the real
chip:  python tools/perf_serving.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship
    from shapy_tpu.io.export import export_regressor, make_serving_fn
    from shapy_tpu.utils.timing import chained_device_ms

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    # exact_counts: same shape-exact mesh as bench.py's headline config.
    regressor = _build_flagship(subdivisions=5, exact_counts=True)
    regressor.backbone_compute_dtype = jnp.bfloat16

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(batch, 256, 256, 3)).astype(np.float32)
    )
    params, mconsts = regressor.params, regressor.model.params

    def timed(call):
        # Mean-reduce on device; a single scalar comes back through the
        # tunnel (fetching vertices would drown the measurement).
        @jax.jit
        def run(p, mc, x):
            out = call(p, mc, x)
            return sum(jnp.mean(v)
                       for v in jax.tree_util.tree_leaves(out))

        # No fori chaining across the exported call (its out tree is a
        # dict, not an image carry); chained_device_ms with k=1 bodies
        # still subtracts dispatch via the two-k fit.
        def body(p, mc, x, k):
            acc = jnp.float32(0)
            for i in range(k):
                acc = acc + run(p, mc, x + acc * 1e-12)
            return acc

        return chained_device_ms(body, (params, mconsts, images),
                                 ks=(1, 5), reps=3)

    results = {}

    live_fn = make_serving_fn(regressor)
    results["live_ms"] = timed(live_fn)

    exported_fixed, _ = export_regressor(
        regressor, batch_size=batch, platforms=("tpu",))
    results["artifact_fixed_ms"] = timed(exported_fixed.call)

    exported_sym, _ = export_regressor(regressor, platforms=("tpu",))
    results["artifact_symbolic_ms"] = timed(exported_sym.call)

    for key in list(results):
        results[key.replace("_ms", "_img_per_s")] = round(
            batch / results[key] * 1000.0, 1)
        results[key] = round(results[key], 2)
    results["batch"] = batch
    print(json.dumps(results))


if __name__ == "__main__":
    main()

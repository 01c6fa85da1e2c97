"""Benchmark: HBW-val-style evaluation throughput on one chip.

Measures the full SHAPY inference pipeline (HRNet-W48 backbone -> 3-stage
iterative head -> SMPL-X LBS -> virtual measurements: mass, height, and the
plane-slice + convex-hull chest/waist/hips) at eval batch size, end to end
under one jit, and reports images/sec/chip.

Baseline note: the reference publishes no benchmark numbers (BASELINE.md).
``vs_baseline`` is computed against an estimated 90 images/sec for the
reference PyTorch pipeline on one A100 (HRNet-W48 @ 256x256 fp32 batched
inference + CUDA BVH measurement kernel + per-image CPU scipy convex
hulls; the hull loop is the reference's bottleneck). The BASELINE.json
target is >= 5x A100 on v5e, i.e. vs_baseline >= 5.
"""

import json
import time

import numpy as np

A100_REFERENCE_IMGS_PER_SEC = 90.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship

    import os

    batch_size = int(os.environ.get("BENCH_BATCH", "128"))
    # subdivisions=5 -> 10242 vertices / 20480 faces, matching the real
    # SMPL-X mesh scale (10475 / 20908) so LBS + measurement cost is honest.
    regressor = _build_flagship(subdivisions=5)
    # bf16 backbone (MXU-native), f32 head/LBS/measurements.
    if os.environ.get("BENCH_BF16", "1") == "1":
        regressor.backbone_compute_dtype = jnp.bfloat16

    @jax.jit
    def forward(params, images):
        out = regressor.apply(params, images)
        last = out["stage_02"]
        return (
            last["betas"],
            last["v_shaped"],
            out["proj_joints"],
            out["measurements"],
        )

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(batch_size, 256, 256, 3)).astype(np.float32)
    )
    params = regressor.params

    # Warmup / compile
    jax.block_until_ready(forward(params, images))

    iters = 10
    start = time.perf_counter()
    for _ in range(iters):
        result = forward(params, images)
    jax.block_until_ready(result)
    elapsed = time.perf_counter() - start

    imgs_per_sec = batch_size * iters / elapsed
    print(
        json.dumps(
            {
                "metric": "hbw_eval_images_per_sec_per_chip",
                "value": round(imgs_per_sec, 2),
                "unit": "images/sec",
                "vs_baseline": round(
                    imgs_per_sec / A100_REFERENCE_IMGS_PER_SEC, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()

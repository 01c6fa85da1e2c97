"""Batch-1 inference latency (VERDICT r3 item 8).

The reference's one published in-repo perf surface is wall-clock s/img
at batch 1 with an explicit device sync around ``model(...)``
(regressor/demo.py:230-237,355). This mirrors it on the flagship:

  * device_ms_batch1: chained-fori device time of the full forward
    (backbone + head + SMPL-X + measurements) at B=1;
  * e2e_ms_batch1: wall clock around one dispatch+fetch of the
    demo-relevant outputs (vertices, betas, measurements, camera) —
    includes the host->device->host hop, which on this dev setup rides
    an ~18 MB/s tunnel; on a locally-attached TPU the hop is PCIe-class.

Prints one JSON line. Env: BATCH1_BF16=1 for the bf16 backbone.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _build_flagship
    from shapy_tpu.utils.timing import chained_device_ms

    regressor = _build_flagship(subdivisions=5)
    if os.environ.get("BATCH1_BF16", "1") == "1":
        regressor.backbone_compute_dtype = jnp.bfloat16
    mconsts = regressor.model.params
    params = regressor.params

    img = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 256, 256, 3)),
        jnp.float32)

    last = f"stage_{regressor.num_stages - 1:02d}"

    def fwd(p, mc, x):
        out = regressor.apply(p, x, model_params=mc)
        st = out[last]
        meas = out.get("measurements") or st.get("measurements") or {}
        return (st["vertices"], st["betas"], out["proj_joints"],
                out["camera_parameters"], meas)

    # device time via chained loop (x feeds back through a scalar)
    @jax.jit
    def run(p, mc, x, k):
        def body(_i, carry):
            x, acc = carry
            verts, betas, pj, cam, meas = fwd(p, mc, x)
            return (x + 1e-12 * verts.mean(), acc + betas[0, 0])

        _, acc = jax.lax.fori_loop(0, k, body, (x, 0.0))
        return acc

    dev_ms = chained_device_ms(run, (params, mconsts, img), ks=(5, 55),
                               reps=3)

    # e2e wall clock: one dispatch + full fetch, like the reference demo
    jfwd = jax.jit(fwd)
    outs = jfwd(params, mconsts, img)
    jax.block_until_ready(outs)  # warm/compile
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        outs = jfwd(params, mconsts, img)
        jax.tree.map(np.asarray, outs)  # full fetch
        times.append(time.perf_counter() - t0)
    e2e_ms = min(times) * 1000.0

    print(json.dumps({
        "device_ms_batch1": round(dev_ms, 3),
        "device_images_per_sec_batch1": round(1000.0 / dev_ms, 2),
        "e2e_ms_batch1": round(e2e_ms, 2),
        "bf16": os.environ.get("BATCH1_BF16", "1"),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

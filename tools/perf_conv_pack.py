"""On-chip micro-benchmark: 2-pixel-packed Pallas conv vs XLA conv.

The exact HRNet branch-0 shape (3x3 48->48 @64x64, stride 1, batch 128,
bfloat16) — the shape where XLA's conv wastes 62% of the MXU lanes
(BENCH.md). Run: python tools/perf_conv_pack.py [batch]
"""

import os
import platform
import sys
import time

import numpy as np


def _chained_ms(body, x0, ks=(16, 256), reps=3):
    import jax

    best = {}
    for k in ks:

        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, k, lambda i, x: body(x), x)

        r = run(x0)
        _ = np.asarray(r).ravel()[:1]
        times = []
        for _i in range(reps):
            t0 = time.perf_counter()
            r = run(x0)
            _ = np.asarray(r).ravel()[:1]
            times.append(time.perf_counter() - t0)
        best[k] = min(times)
    k0, k1 = ks
    return (best[k1] - best[k0]) / (k1 - k0) * 1000.0


def main():
    cache_dir = f"/tmp/shapy_tpu_xla_cache_{platform.node()}"
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from shapy_tpu.ops.conv_pack import conv3x3_pack2, pack_weights

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    H = W = 64
    C = 48
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, H, W, C)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.05, jnp.bfloat16)
    wp = pack_weights(w)
    scale = jnp.asarray(rng.normal(size=C), jnp.float32)
    bias = jnp.asarray(rng.normal(size=C), jnp.float32)

    flops = 2 * batch * H * W * C * C * 9

    def xla_body(x):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.maximum(y * 0.99, 0.0) + x * 1e-3

    ms = _chained_ms(xla_body, x)
    print(f"XLA conv+relu      : {ms:7.3f} ms  {flops/ms/1e9:8.1f} GFLOP/s",
          flush=True)

    def pallas_body(x):
        y = conv3x3_pack2(x, wp, scale, bias, relu=True)
        return y + x * 1e-3

    ms = _chained_ms(pallas_body, x)
    print(f"pallas pack2 conv  : {ms:7.3f} ms  {flops/ms/1e9:8.1f} GFLOP/s",
          flush=True)


if __name__ == "__main__":
    main()

"""Micro-benchmarks: conv MXU behavior on this chip.

Measures (chained fori_loop, single fetch):
  1. 3x3 conv 48->48 @64x64 (HRNet branch-0 shape) bf16
  2. same with output channels padded to 128
  3. same as one merged conv 48->192 (4 blocks' worth of lanes)
  4. 3x3 conv 384->384 @8x8 (branch-3 shape) bf16
  5. int8 variant of (1) and (4) (s8 x s8 -> s32), if supported
  6. big dense matmul bf16 (MXU roofline sanity)

Usage: python tools/perf_conv_micro.py [batch]
"""

import os
import sys
import time

import numpy as np


def _chained_ms(body, x0, ks=(16, 516), reps=3):
    import jax

    best = {}
    for k in ks:

        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, k, lambda i, x: body(x), x)

        r = run(x0)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
        times = []
        for _i in range(reps):
            t0 = time.perf_counter()
            r = run(x0)
            _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
            times.append(time.perf_counter() - t0)
        best[k] = min(times)
    k0, k1 = ks
    return (best[k1] - best[k0]) / (k1 - k0) * 1000.0


def main():
    import platform

    cache_dir = f"/tmp/shapy_tpu_xla_cache_{platform.node()}"
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.default_rng(0)

    def conv_case(name, H, cin, cout, dtype, k=3):
        x = jnp.asarray(
            rng.normal(size=(batch, H, H, cin)), dtype=jnp.float32
        )
        w = jnp.asarray(rng.normal(size=(k, k, cin, cout)) * 0.05,
                        dtype=jnp.float32)
        if dtype == "int8":
            xq = (x * 10).astype(jnp.int8)
            wq = (w * 100).astype(jnp.int8)

            def body(xq):
                y = jax.lax.conv_general_dilated(
                    xq, wq, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                )
                # keep shape: fold back to int8 input
                return (y[..., :cin] >> 7).astype(jnp.int8)

            x0 = xq
        else:
            xb = x.astype(dtype)
            wb = w.astype(dtype)

            def body(xb):
                y = jax.lax.conv_general_dilated(
                    xb, wb, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                return y[..., :cin] * jnp.asarray(1e-2, dtype)

            x0 = xb
        try:
            ms = _chained_ms(body, x0)
        except Exception as e:  # int8 conv may be unsupported
            print(f"{name}: FAILED ({type(e).__name__}: {e})", flush=True)
            return
        flops = batch * H * H * cout * cin * 9 * 2
        print(f"{name}: {ms:7.3f} ms  {flops / ms / 1e9:8.1f} GFLOP/s",
              flush=True)

    conv_case("conv 48->48  @64 bf16", 64, 48, 48, jnp.bfloat16)
    conv_case("conv 48->128 @64 bf16", 64, 48, 128, jnp.bfloat16)
    conv_case("conv 48->192 @64 bf16", 64, 48, 192, jnp.bfloat16)
    conv_case("conv 128->128@64 bf16", 64, 128, 128, jnp.bfloat16)
    conv_case("conv 384->384@8  bf16", 8, 384, 384, jnp.bfloat16)
    conv_case("conv 48->48  @64 int8", 64, 48, 48, "int8")
    conv_case("conv 128->128@64 int8", 64, 128, 128, "int8")
    conv_case("conv 384->384@8  int8", 8, 384, 384, "int8")

    # MXU roofline sanity: big bf16 matmul
    m = 4096
    a = jnp.asarray(rng.normal(size=(m, m)), jnp.bfloat16)

    def mm(a):
        return (a @ a) * jnp.asarray(1e-3, jnp.bfloat16)

    ms = _chained_ms(mm, a)
    print(f"matmul 4096^3 bf16: {ms:7.3f} ms  "
          f"{2 * m**3 / ms / 1e9:8.1f} GFLOP/s", flush=True)

    mi8 = (np.asarray(a, np.float32) * 10).astype(np.int8)
    ai = jnp.asarray(mi8)

    def mmi(ai):
        y = jax.lax.dot_general(
            ai, ai, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (y >> 12).astype(jnp.int8)

    try:
        ms = _chained_ms(mmi, ai)
        print(f"matmul 4096^3 int8: {ms:7.3f} ms  "
              f"{2 * m**3 / ms / 1e9:8.1f} GOP/s", flush=True)
    except Exception as e:
        print(f"matmul int8: FAILED ({e})", flush=True)


if __name__ == "__main__":
    main()

"""Round-3 long-chain conv probes for the lane-starved HRNet branch-0 shape.

Variants at (B=128, 64x64, C=48, 3x3, stride 1, bf16):
  a. XLA direct conv (the shipped path)
  b. pair-packed XLA conv: x reshaped to (B, H, W/2, 2C), kernel (3, 3,
     2C, 2C) with structural zeros (1.5x MAC inflation, 96/128 lanes) —
     the 2-pixel lane-packing trick WITHOUT a Pallas kernel
  c. conv 128->128 @64 (full-lane reference efficiency)

Verdict recorded in BENCH.md round 3: (a) already runs at 110.6 TFLOP/s
useful (62% of the 179 TFLOP/s measured matmul roofline) — the round-2
"62% lane waste" reading came from a chained-loop body whose
relu+residual carry added ~0.3 ms/iter of HBM-bound elementwise on top
of the 0.2 ms conv. Packing variants (b, and the deleted Pallas
conv3x3_pack2 kernel: 14.03 ms vs 0.197 ms) only lose.

Usage: python tools/perf_conv_probe3.py [batch]
"""

import os
import platform
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _chained_ms(body, x0, ks=(256, 2304), reps=3):
    """On-device .mean() then a 4-byte float() fetch — NEVER fetch the
    carried array itself, which costs seconds through the tunnel and
    swamps the signal. One compile per variant (dynamic trip count):
    tunnel compiles cost minutes each."""
    import jax
    import jax.numpy as jnp

    from shapy_tpu.utils.timing import chained_device_ms

    @jax.jit
    def run(x, k):
        y = jax.lax.fori_loop(0, k, lambda i, x: body(x), x,
                              unroll=False)
        return y.mean()

    return chained_device_ms(
        lambda x, k: run(x, jnp.int32(k)), (x0,), ks=ks, reps=reps,
        verbose=True)


def main():
    cache_dir = f"/tmp/shapy_tpu_xla_cache_{platform.node()}"
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    H = W = 64
    C = 48
    rng = np.random.default_rng(0)
    useful = 2 * batch * H * W * C * C * 9

    x = jnp.asarray(rng.normal(size=(batch, H, W, C)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.05, jnp.bfloat16)

    # Loop bodies carry the OUTPUT and perturb the weights with a tiny
    # slice of it — serializes iterations with negligible non-conv work
    # (the earlier relu+residual carry added ~0.3 ms/iter of pure HBM
    # elementwise traffic at these sizes).
    def conv_body(y):
        wi = w + y[0, :3, :3, :, None] * 1e-9
        return jax.lax.conv_general_dilated(
            x, wi.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    ms = _chained_ms(conv_body, jnp.zeros_like(x))
    print(f"a. XLA 48->48 direct : {ms:7.3f} ms  {useful/ms/1e9:7.1f} "
          "TFLOP/s useful", flush=True)

    # b. pair-packed: (B, H, W/2, 2C), kernel (3, 3, 2C, 2C)
    wp = np.zeros((3, 3, 2 * C, 2 * C), np.float32)
    wn = np.asarray(w, np.float32)
    # output even pixel 2j (out lanes 0:C): taps pixels 2j-1..2j+1 =
    #   pairs (j-1, odd=C:), (j, even=:C), (j, odd=C:)
    # kernel pair-dx index kp in {0,1,2} maps to input pair j-1+kp.
    wp[:, 0, C:, :C] = wn[:, 0]          # pair j-1 odd  -> dx=-1
    wp[:, 1, :C, :C] = wn[:, 1]          # pair j   even -> dx=0
    wp[:, 1, C:, :C] = wn[:, 2]          # pair j   odd  -> dx=+1
    # output odd pixel 2j+1 (out lanes C:2C): taps 2j..2j+2 =
    #   pairs (j, even), (j, odd), (j+1, even)
    wp[:, 1, :C, C:] = wn[:, 0]
    wp[:, 1, C:, C:] = wn[:, 1]
    wp[:, 2, :C, C:] = wn[:, 2]
    wp = jnp.asarray(wp, jnp.bfloat16)
    xp = x.reshape(batch, H, W // 2, 2 * C)

    def pack_conv(xp, wp):
        return jax.lax.conv_general_dilated(
            xp, wp, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def pack_body(y):
        wi = wp + y[0, :3, :3, :, None] * 1e-9
        return pack_conv(xp, wi.astype(xp.dtype))

    # correctness check once, on a small slice (full-batch fetch through
    # the tunnel costs ~10 s at 18 MB/s)
    ya = np.asarray(jax.lax.conv_general_dilated(
        x[:2], w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")), np.float32)
    yb = np.asarray(pack_conv(xp[:2], wp), np.float32).reshape(
        2, H, W, C)
    err = np.abs(ya - yb).max()
    print(f"   pack-vs-direct max err {err:.4f} (bf16 tol)", flush=True)
    ms = _chained_ms(pack_body, jnp.zeros_like(xp))
    print(f"b. XLA pair-packed   : {ms:7.3f} ms  {useful/ms/1e9:7.1f} "
          "TFLOP/s useful", flush=True)

    x128 = jnp.asarray(rng.normal(size=(batch, H, W, 128)), jnp.bfloat16)
    w128 = jnp.asarray(rng.normal(size=(3, 3, 128, 128)) * 0.05,
                       jnp.bfloat16)
    useful128 = 2 * batch * H * W * 128 * 128 * 9

    def conv128_body(y):
        wi = w128 + y[0, :3, :3, :, None] * 1e-9
        return jax.lax.conv_general_dilated(
            x128, wi.astype(x128.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    ms = _chained_ms(conv128_body, jnp.zeros_like(x128))
    print(f"c. XLA 128->128      : {ms:7.3f} ms  {useful128/ms/1e9:7.1f} "
          "TFLOP/s useful", flush=True)


if __name__ == "__main__":
    main()

"""Pallas conv for the MXU-lane-starved 3x3 low-channel convs.

Why: HRNet-W48's dominant cost is 64 layers of 3x3 48->48 stride-1 convs
at 64x64 (branch 0 of every stage). As a matmul their N axis (output
channels) is 48 of the MXU's 128 lanes — XLA reaches ~63 TFLOP/s bf16 at
this shape (measured, tools/perf_conv_micro.py), which is ~85% of the
37.5%-lane ceiling; no amount of XLA tuning recovers the idle lanes.

The packing trick here: put TWO horizontally adjacent output pixels on
the lane axis (N' = 2*48 = 96 of 128). Their input taps overlap in a
3x4 patch, so the matmul becomes [M, 12*C] @ [12*C, 128] with a
block-sparse weight layout:

    B[(dy, dxp, cin), j]      = w[dy, dxp,     cin, j]      (j <  48,
                                                             dxp <= 2)
    B[(dy, dxp, cin), 48 + j] = w[dy, dxp - 1, cin, j]      (dxp >= 1)
    (zero elsewhere; lanes 96..127 zero)

MXU-work inflation (576x128 vs the useful 432x96) is 1.78x, but lane
utilisation rises 2x and K stays dense, so the packed matmul's ceiling is
~110 TFLOP/s vs the 74 TFLOP/s layout ceiling of the direct form.

The kernel processes one batch image per grid cell: DMA of the (padded)
image into VMEM, 12 strided VPU copies assemble the im2col A matrix
[H*W/2, 576], one MXU matmul against the packed weights, lane de-interleave,
write-back. Optional fused scale/bias + ReLU epilogue covers the
eval-time folded-BN form (layers.bn_fold_params).

Measured on v5e (tools/perf_conv_micro.py shapes, batch 128): see
BENCH.md round-3 entry before trusting this docstring's motivation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def pack_weights(w: np.ndarray | Array) -> Array:
    """(3, 3, C, C) -> (12 * C, 128) packed B matrix (bf16)."""
    w = jnp.asarray(w)
    k, _, cin, cout = w.shape
    assert k == 3 and cin == cout and 2 * cout <= 128, w.shape
    blocks = []
    for dy in range(3):
        for dxp in range(4):
            blk = jnp.zeros((cin, 128), w.dtype)
            if dxp <= 2:  # even pixel: tap dx = dxp
                blk = blk.at[:, :cout].set(w[dy, dxp])
            if dxp >= 1:  # odd pixel: tap dx = dxp - 1
                blk = blk.at[:, cout:2 * cout].set(w[dy, dxp - 1])
            blocks.append(blk)
    return jnp.concatenate(blocks, axis=0)  # (12*C, 128)


def _kernel(x_ref, b_ref, s_ref, out_ref, *, H, W, C, relu):
    """One batch image per cell.

    x_ref: (1, H+2, W+2, C) padded input block (VMEM)
    b_ref: (12*C, 128) packed weights; s_ref: (2, 128) scale/bias rows
    out_ref: (1, H, W, C)
    """
    x = x_ref[0]  # (H+2, W+2, C)
    xr = x.reshape(H + 2, (W + 2) // 2, 2, C)
    blocks = []
    for dy in range(3):
        for dxp in range(4):
            pair0 = dxp // 2  # padded col 2j+dxp = pair j+dxp//2, parity dxp%2
            par = dxp % 2
            blk = xr[dy:dy + H, pair0:pair0 + W // 2, par, :]
            blocks.append(blk.reshape(H * (W // 2), C))
    a = jnp.concatenate(blocks, axis=-1)  # (H*W/2, 12*C)
    acc = jnp.dot(a, b_ref[:], preferred_element_type=jnp.float32)
    acc = acc * s_ref[0][None, :] + s_ref[1][None, :]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    y = acc.astype(out_ref.dtype)
    even = y[:, :C].reshape(H, W // 2, 1, C)
    odd = y[:, C:2 * C].reshape(H, W // 2, 1, C)
    out_ref[0] = jnp.concatenate([even, odd], axis=2).reshape(H, W, C)


@functools.partial(jax.jit, static_argnames=("relu", "interpret"))
def conv3x3_pack2(
    x: Array,
    w_packed: Array,
    scale: Optional[Array] = None,
    bias: Optional[Array] = None,
    relu: bool = False,
    interpret: bool = False,
) -> Array:
    """3x3 stride-1 pad-1 conv, C -> C (C <= 64), NHWC.

    x: (B, H, W, C); w_packed: from :func:`pack_weights`.
    scale/bias: optional per-channel epilogue (folded BN); identity when
    None. Output dtype = x dtype; accumulation f32.
    """
    B, H, W, C = x.shape
    assert W % 2 == 0
    # pad: 1 ring (top/bottom/left/right); W+2 stays even so the padded
    # row reshapes exactly into (W+2)/2 pixel pairs.
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    if scale is None:
        srow = jnp.ones((128,), jnp.float32)
    else:
        srow = jnp.zeros((128,), jnp.float32)
        srow = srow.at[:C].set(scale.astype(jnp.float32))
        srow = srow.at[C:2 * C].set(scale.astype(jnp.float32))
    if bias is None:
        brow = jnp.zeros((128,), jnp.float32)
    else:
        brow = jnp.zeros((128,), jnp.float32)
        brow = brow.at[:C].set(bias.astype(jnp.float32))
        brow = brow.at[C:2 * C].set(bias.astype(jnp.float32))
    sb = jnp.stack([srow, brow])  # (2, 128)

    kern = functools.partial(_kernel, H=H, W=W, C=C, relu=relu)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H + 2, W + 2, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12 * C, 128), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * (W // 2) * (12 * C) * 128,
            bytes_accessed=x.nbytes + 12 * C * 128 * 2 + x.nbytes,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, w_packed, sb)


def conv3x3_pack2_reference(x, w, scale=None, bias=None, relu=False):
    """XLA reference implementation for correctness tests."""
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(w, x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32)
    if scale is not None:
        y = y * scale
    if bias is not None:
        y = y + bias
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)

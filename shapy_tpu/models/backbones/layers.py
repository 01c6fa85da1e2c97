"""Functional conv-net building blocks with torch-compatible param naming.

Design: instead of a module framework, networks are pure functions over a
flat ``{name: array}`` param dict whose keys exactly match the reference
PyTorch ``state_dict`` names (e.g. ``stage2.0.branches.1.3.conv2.weight``).
This makes checkpoint import a mechanical transpose (OIHW -> HWIO), keeps
the whole forward pass jittable/shardable as ``f(params, x)``, and lets the
same code serve init (a ``ParamStore`` in create mode) and inference.

Conventions: NHWC activations (TPU-native), HWIO conv kernels, BatchNorm
with running stats stored like torch (``running_mean`` / ``running_var``).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

Array = jax.Array
BN_MOMENTUM = 0.1


class ParamStore:
    """Flat param dict access with optional create-on-first-use init mode."""

    def __init__(
        self,
        params: Optional[Dict[str, Array]] = None,
        rng: Optional[np.random.Generator] = None,
        init: bool = False,
        dtype=jnp.float32,
        fold_bn: bool = False,
    ):
        self.params: Dict[str, Array] = params if params is not None else {}
        self.rng = rng or np.random.default_rng(0)
        self.init = init
        self.dtype = dtype
        # Eval-time BatchNorm folding: when True, conv+BN pairs compute
        # conv(x, w * scale) + bias instead of BN(conv(x, w)) —
        # identical math, but the affine moves from O(activations) to
        # O(params) work. Measured on v5e: the unfolded BN passes cost
        # 19 ms of the 69 ms W48 backbone at batch 128 (XLA does NOT
        # fuse them into the conv epilogues). Only valid in eval mode.
        self.fold_bn = fold_bn
        # batch-stat updates collected during a train-mode forward
        self.stat_updates: Dict[str, Array] = {}

    def get(self, name: str, shape: Tuple[int, ...],
            initializer: str = "zeros") -> Array:
        if name not in self.params:
            if not self.init:
                raise KeyError(f"Missing parameter: {name}")
            if initializer == "conv_normal":
                # Reference init: normal(std=0.001) (hrnet.py init_weights).
                arr = self.rng.normal(size=shape) * 0.001
            elif initializer == "kaiming":
                fan_in = int(np.prod(shape[:-1]))
                arr = self.rng.normal(size=shape) * np.sqrt(2.0 / fan_in)
            elif initializer == "ones":
                arr = np.ones(shape)
            else:
                arr = np.zeros(shape)
            self.params[name] = jnp.asarray(arr, dtype=self.dtype)
        return self.params[name]


def bn_fold_params(
    store: ParamStore, bn_name: str, c: int, eps: float = 1e-5
) -> Tuple[Array, Array]:
    """(scale, bias) of the eval-mode BN affine, in float32.

    BN(y) = (y - mean) * gamma / sqrt(var + eps) + beta
          = y * scale + bias.
    """
    gamma = store.get(f"{bn_name}.weight", (c,), "ones")
    beta = store.get(f"{bn_name}.bias", (c,), "zeros")
    rmean = store.get(f"{bn_name}.running_mean", (c,), "zeros")
    rvar = store.get(f"{bn_name}.running_var", (c,), "ones")
    scale = gamma.astype(jnp.float32) * jax.lax.rsqrt(
        rvar.astype(jnp.float32) + eps
    )
    bias = beta.astype(jnp.float32) - rmean.astype(jnp.float32) * scale
    return scale, bias


def conv2d(
    store: ParamStore,
    name: str,
    x: Array,
    out_ch: int,
    kernel: int,
    stride: int = 1,
    padding: int = 0,
    bias: bool = False,
    initializer: str = "conv_normal",
    fold_bn: Optional[str] = None,
    bn_eps: float = 1e-5,
) -> Array:
    """NHWC conv with torch-style explicit padding.

    With ``fold_bn`` set (a BN param prefix) and ``store.fold_bn`` on,
    the BN eval affine is folded into the kernel and bias — the caller
    must then SKIP its batch_norm call.

    Note: an int8 (s8 x s8 -> s32) variant of this path was measured on
    v5e and REJECTED: despite the MXU's 2x int8 peak, XLA's int8 conv
    lowering ran the full W48 backbone 3.7x SLOWER than bf16 (341 ms vs
    93 ms at batch 128) — see BENCH.md. Revisit only with a hand-written
    Mosaic kernel.
    """
    in_ch = x.shape[-1]
    w = store.get(f"{name}.weight", (kernel, kernel, in_ch, out_ch),
                  initializer)
    b = store.get(f"{name}.bias", (out_ch,), "zeros") if bias else None
    if fold_bn is not None and store.fold_bn:
        scale, fbias = bn_fold_params(store, fold_bn, out_ch, bn_eps)
        w = w.astype(jnp.float32) * scale
        if b is not None:
            fbias = fbias + b.astype(jnp.float32) * scale
        b = fbias
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    # Tag for selective rematerialization: under remat="convs" the
    # checkpoint policy saves exactly these (the expensive MXU results)
    # and recomputes the cheap BN/ReLU elementwise chains in the backward
    # pass. A no-op outside jax.checkpoint regions.
    return checkpoint_name(y, "conv_out")


def _bn_moments(x: Array, axis_name: Optional[str]):
    """f32 batch moments (E[x], E[x^2] -> mean, var) over all but the
    channel axis, optionally ``lax.pmean``-ed (SyncBN: all-reduce the RAW
    moments like torch SyncBatchNorm — averaging per-device variances
    would understate the global variance by the spread of the means)."""
    reduce_axes = tuple(range(x.ndim - 1))
    # Moments in f32 regardless of compute dtype: with a bfloat16
    # backbone (mixed-precision training) a bf16 reduction over
    # B*H*W elements loses the batch statistics' low bits, which
    # both skews normalisation and corrupts the running stats.
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=reduce_axes)
    mean_sq = jnp.mean(jnp.square(xf), axis=reduce_axes)
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        mean_sq = jax.lax.pmean(mean_sq, axis_name)
    var = mean_sq - jnp.square(mean)
    return mean, var


def _bn_normalize(x, gamma, beta, mean, var, eps):
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps).astype(x.dtype)
    xhat = (x - mean.astype(x.dtype)) * inv
    return xhat * gamma.astype(x.dtype) + beta.astype(x.dtype), xhat, inv


def _bn_train_core(x, gamma, beta, eps, axis_name):
    mean, var = _bn_moments(x, axis_name)
    y, _, _ = _bn_normalize(x, gamma, beta, mean, var, eps)
    return y, mean, var


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bn_train_core(x, gamma, beta, eps, axis_name):
    """Train-mode BN with a hand-written backward.

    Returns ``(y, mean_f32, var_f32)`` (moments exported for the running-
    stat EMA). Same math as differentiating through :func:`_bn_moments`,
    but the backward is the standard fused two-reduction BN formula:

        dx = gamma * rstd * (dy - mean(dy) - xhat * mean(dy * xhat))

    Measured on v5e (batch 128, 64x64x48, bf16): autodiff through the
    moments costs 0.53 ms/layer for the conv+BN+relu backward vs 0.23 ms
    for this formula + the dgrad conv — the autodiff graph spends extra
    HBM passes re-deriving xhat and splitting the mean/var contributions.
    ~190 BN layers make this the round-3 train-step lever (BENCH.md)."""
    return _bn_train_core(x, gamma, beta, eps, axis_name)


def _bn_train_fwd(x, gamma, beta, eps, axis_name):
    mean, var = _bn_moments(x, axis_name)
    y, xhat, inv = _bn_normalize(x, gamma, beta, mean, var, eps)
    return (y, mean, var), (xhat, inv, gamma, x.shape)


def _bn_train_bwd(eps, axis_name, res, cts):
    dy, dmean_ct, dvar_ct = cts
    xhat, inv, gamma, xshape = res
    reduce_axes = tuple(range(len(xshape) - 1))
    n = float(np.prod([xshape[a] for a in reduce_axes]))

    dyf = dy.astype(jnp.float32)
    sdy = jnp.sum(dyf, axis=reduce_axes)
    sdyx = jnp.sum(dyf * xhat.astype(jnp.float32), axis=reduce_axes)
    # Param grads: plain sums under GSPMD (axis_name=None — the
    # partitioner inserts the cross-device reduction itself); explicit
    # psum under shard_map SyncBN, where the custom bwd is responsible
    # for returning a properly-replicated cotangent for the replicated
    # gamma/beta (shard_map's VMA check enforces this).
    dgamma, dbeta = sdyx, sdy
    if axis_name is not None:
        dgamma = jax.lax.psum(dgamma, axis_name)
        dbeta = jax.lax.psum(dbeta, axis_name)
    dgamma = dgamma.astype(gamma.dtype)
    dbeta = dbeta.astype(gamma.dtype)

    mdy, mdyx = sdy / n, sdyx / n
    if axis_name is not None:
        # dx couples every element through the pmean'd moments.
        mdy = jax.lax.pmean(mdy, axis_name)
        mdyx = jax.lax.pmean(mdyx, axis_name)
    scale = (gamma.astype(jnp.float32) * inv.astype(jnp.float32))
    dx = scale.astype(dy.dtype) * (
        dy - mdy.astype(dy.dtype) - xhat * mdyx.astype(dy.dtype)
    )

    # Cotangents for the exported moments (zero in normal training — the
    # EMA side channel is not differentiated; kept for correctness).
    # d mean/d x_i = 1/n_total; d var/d x_i = 2 (x_i - mean)/n_total,
    # with (x_i - mean) == xhat / inv and n_total = n * num_devices
    # under SyncBN (the pmean'd moments spread each element's influence
    # across the global batch).
    n_total = n
    if axis_name is not None:
        dmean_ct = jax.lax.pmean(dmean_ct, axis_name)
        dvar_ct = jax.lax.pmean(dvar_ct, axis_name)
        n_total = n * jax.lax.psum(1.0, axis_name)
    dx = dx + (dmean_ct / n_total).astype(dy.dtype) + (
        dvar_ct * 2.0 / n_total).astype(dy.dtype) * (xhat / inv)
    return dx, dgamma, dbeta


bn_train_core.defvjp(_bn_train_fwd, _bn_train_bwd)


def batch_norm(
    store: ParamStore,
    name: str,
    x: Array,
    train: bool = False,
    eps: float = 1e-5,
    momentum: float = BN_MOMENTUM,
    axis_name: Optional[str] = None,
) -> Array:
    """BatchNorm2d matching torch semantics.

    In train mode, batch statistics are used and running-stat updates are
    recorded in ``store.stat_updates``. With ``axis_name`` set (SyncBN
    equivalent, reference evaluate.py:100-105), the batch moments are
    ``lax.pmean``-ed over that mesh axis.
    """
    c = x.shape[-1]
    gamma = store.get(f"{name}.weight", (c,), "ones")
    beta = store.get(f"{name}.bias", (c,), "zeros")
    rmean = store.get(f"{name}.running_mean", (c,), "zeros")
    rvar = store.get(f"{name}.running_var", (c,), "ones")

    if train:
        y, mean, var = bn_train_core(x, gamma, beta, eps, axis_name)
        reduce_axes = tuple(range(x.ndim - 1))
        n = np.prod([x.shape[a] for a in reduce_axes])
        unbiased = var * (n / max(n - 1, 1))
        store.stat_updates[f"{name}.running_mean"] = (
            (1 - momentum) * rmean + momentum * mean.astype(rmean.dtype)
        )
        store.stat_updates[f"{name}.running_var"] = (
            (1 - momentum) * rvar + momentum * unbiased.astype(rvar.dtype)
        )
        return y

    y, _, _ = _bn_normalize(x, gamma, beta, rmean, rvar, eps)
    return y


def conv_bn_relu(store, name_conv, name_bn, x, out_ch, kernel, stride,
                 padding, train, relu=True, axis_name=None, bias=False):
    if store.fold_bn and not train:
        y = conv2d(store, name_conv, x, out_ch, kernel, stride, padding,
                   bias=bias, fold_bn=name_bn)
    else:
        y = conv2d(store, name_conv, x, out_ch, kernel, stride, padding,
                   bias=bias)
        y = batch_norm(store, name_bn, y, train, axis_name=axis_name)
    return jax.nn.relu(y) if relu else y


def basic_block(store: ParamStore, prefix: str, x: Array, planes: int,
                stride: int = 1, downsample: bool = False,
                train: bool = False, axis_name=None) -> Array:
    """torchvision BasicBlock: 3x3(stride)-BN-ReLU-3x3-BN + skip -> ReLU."""
    identity = x
    y = conv_bn_relu(store, f"{prefix}.conv1", f"{prefix}.bn1", x, planes,
                     3, stride, 1, train, axis_name=axis_name)
    y = conv_bn_relu(store, f"{prefix}.conv2", f"{prefix}.bn2", y, planes,
                     3, 1, 1, train, relu=False, axis_name=axis_name)
    if downsample:
        identity = conv_bn_relu(store, f"{prefix}.downsample.0",
                                f"{prefix}.downsample.1", x, planes, 1,
                                stride, 0, train, relu=False,
                                axis_name=axis_name)
    return jax.nn.relu(y + identity)


def bottleneck_block(store: ParamStore, prefix: str, x: Array, planes: int,
                     stride: int = 1, downsample: bool = False,
                     train: bool = False, downsample_has_bn: bool = True,
                     axis_name=None) -> Array:
    """torchvision Bottleneck: 1x1-BN-ReLU-3x3(stride)-BN-ReLU-1x1(x4)-BN
    + skip -> ReLU. ``downsample_has_bn=False`` covers the reference's
    final conv head, whose downsample is a bare 1x1 conv
    (hrnet.py:363-372)."""
    identity = x
    out_ch = planes * 4
    y = conv_bn_relu(store, f"{prefix}.conv1", f"{prefix}.bn1", x, planes,
                     1, 1, 0, train, axis_name=axis_name)
    y = conv_bn_relu(store, f"{prefix}.conv2", f"{prefix}.bn2", y, planes,
                     3, stride, 1, train, axis_name=axis_name)
    y = conv_bn_relu(store, f"{prefix}.conv3", f"{prefix}.bn3", y, out_ch,
                     1, 1, 0, train, relu=False, axis_name=axis_name)
    if downsample:
        if downsample_has_bn:
            identity = conv_bn_relu(store, f"{prefix}.downsample.0",
                                    f"{prefix}.downsample.1", x, out_ch, 1,
                                    stride, 0, train, relu=False,
                                    axis_name=axis_name)
        else:
            identity = conv2d(store, f"{prefix}.downsample", x, out_ch, 1,
                              stride, 0)
    return jax.nn.relu(y + identity)


def nearest_upsample(x: Array, factor: int) -> Array:
    """Nearest-neighbour upsample (torch nn.Upsample(mode='nearest'))."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :], (B, H, factor, W, factor, C)
    )
    return x.reshape(B, H * factor, W * factor, C)

"""HRNet-W48 backbone (pure-JAX functional, NHWC, torch-name params).

Architectural spec: reference ``regressor/human_shape/models/backbone/
hrnet.py:18-554`` (ExPose variant of HRNetV2-W48):

  stem (2 x stride-2 conv-BN-ReLU, 64ch)
  -> stage1: 4 Bottleneck(64) blocks (256ch out)
  -> transition1 -> stage2: 1 module, 2 branches (48, 96), 4 BasicBlocks
  -> transition2 -> stage3: 4 modules, 3 branches (48, 96, 192)
  -> transition3 -> stage4: 3 modules, 4 branches (48, 96, 192, 384)
  -> head: subsample every branch to 1/32 resolution (stride-2 convs with
     bias, hrnet.py:376-392), concat to 4*384=1536, 5 Bottleneck(512)
     layers to 2048 (downsample = bare 1x1 conv, hrnet.py:363-372),
     global mean-pool -> output['concat'] (B, 2048).

Param keys equal the torch ``state_dict`` keys, so the shipped SHAPY /
ImageNet checkpoints import with a transpose only (see
``hrnet_import.py``). Both variants are implemented: the default and the
``use_old_impl=True`` topology (hrnet.py:207,272-295,463-481), in which
stage4 is built but skipped in the forward pass and the head concatenates
[subsample_3(x1/8), subsample_2(x1/16), x1/32] (1152 channels) from the
transition3 outputs.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from shapy_tpu.models.backbones.layers import (
    ParamStore,
    basic_block,
    batch_norm,
    bn_fold_params,
    bottleneck_block,
    conv_bn_relu,
    nearest_upsample,
)

Array = jax.Array

# (num_modules, num_branches, num_blocks, num_channels, block)
W48_STAGES = {
    "stage1": (1, 1, (4,), (64,), "BOTTLENECK"),
    "stage2": (1, 2, (4, 4), (48, 96), "BASIC"),
    "stage3": (4, 3, (4, 4, 4), (48, 96, 192), "BASIC"),
    "stage4": (3, 4, (4, 4, 4, 4), (48, 96, 192, 384), "BASIC"),
}


def _expansion(block: str) -> int:
    return 4 if block == "BOTTLENECK" else 1


def _branch_channels(stage: str) -> List[int]:
    _, _, _, chans, block = W48_STAGES[stage]
    return [c * _expansion(block) for c in chans]


def _run_block_seq(store, prefix, x, block, planes, num_blocks, train,
                   axis_name):
    fn = bottleneck_block if block == "BOTTLENECK" else basic_block
    out_ch = planes * _expansion(block)
    for i in range(num_blocks):
        downsample = i == 0 and x.shape[-1] != out_ch
        x = fn(store, f"{prefix}.{i}", x, planes, 1, downsample, train,
               axis_name=axis_name)
    return x


def _transition(store, name, xs, pre_ch, cur_ch, train, axis_name):
    """Branch-count / channel adaptation between stages
    (hrnet.py:306-340). Returns one tensor per current branch."""
    out = []
    for i in range(len(cur_ch)):
        if i < len(pre_ch):
            if cur_ch[i] != pre_ch[i]:
                out.append(
                    conv_bn_relu(
                        store, f"{name}.{i}.0", f"{name}.{i}.1", xs[i],
                        cur_ch[i], 3, 1, 1, train, axis_name=axis_name,
                    )
                )
            else:
                out.append(xs[i])
        else:
            y = xs[-1]
            for j in range(i + 1 - len(pre_ch)):
                out_c = cur_ch[i] if j == i - len(pre_ch) else y.shape[-1]
                y = conv_bn_relu(
                    store, f"{name}.{i}.{j}.0", f"{name}.{i}.{j}.1", y,
                    out_c, 3, 2, 1, train, axis_name=axis_name,
                )
            out.append(y)
    return out


def _merged_conv(store, names_and_shapes, x, stride, padding,
                 bn_names=None):
    """One conv whose output channels are the concatenation of several
    same-input convs' outputs (identical math, fewer + better-lane-packed
    MXU calls; the 48-channel contributions alone waste 62% of the MXU
    lanes when run as separate convs). Returns the per-name chunks.

    With ``bn_names`` (one BN prefix per conv) and ``store.fold_bn`` on,
    each contribution's eval-mode BN affine is folded into its kernel
    slice and chunk bias — the caller must then skip its batch_norm."""
    ws = [store.get(name, shape, "conv_normal")
          for name, shape in names_and_shapes]
    folded = bn_names is not None and store.fold_bn
    biases = None
    if folded:
        sbs = [
            bn_fold_params(store, bn, shape[-1])
            for bn, (_, shape) in zip(bn_names, names_and_shapes)
        ]
        ws = [w.astype(jnp.float32) * s for w, (s, _) in zip(ws, sbs)]
        biases = [b for _, b in sbs]
    wcat = jnp.concatenate(ws, axis=-1)
    y = jax.lax.conv_general_dilated(
        x,
        wcat.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    chunks = []
    off = 0
    for i, (_, shape) in enumerate(names_and_shapes):
        c = y[..., off:off + shape[-1]]
        if folded:
            c = c + biases[i].astype(c.dtype)
        chunks.append(c)
        off += shape[-1]
    return chunks


def _fuse(store, prefix, xs, channels, train, axis_name):
    """Multi-resolution fusion (hrnet.py:118-170,186-194): every output
    branch sums contributions from every input branch, upsampling (1x1
    conv + BN + nearest) from finer-indexed and strided-conv downsampling
    from coarser-indexed branches.

    TPU scheduling: all contributions that share a source branch and a
    stride are computed as ONE conv with concatenated output channels
    (same parameters, same math), then split for their per-target BN."""
    n = len(xs)
    contrib = [[xs[i]] for i in range(n)]
    folded = store.fold_bn and not train

    # Upsampled contributions: source j -> all targets i < j share the
    # input xs[j] and a 1x1 stride-1 conv; merge them.
    for j in range(1, n):
        targets = list(range(j))
        names = [
            (f"{prefix}.{i}.{j}.0.weight",
             (1, 1, xs[j].shape[-1], channels[i]))
            for i in targets
        ]
        bns = [f"{prefix}.{i}.{j}.1" for i in targets]
        chunks = _merged_conv(store, names, xs[j], 1, 0,
                              bn_names=bns if folded else None)
        for i, t in zip(targets, chunks):
            if not folded:
                t = batch_norm(store, f"{prefix}.{i}.{j}.1", t, train,
                               axis_name=axis_name)
            contrib[i].append(nearest_upsample(t, 2 ** (j - i)))

    # Downsampled contributions: source j -> targets i > j are chains of
    # stride-2 3x3 convs; every chain's FIRST hop shares xs[j], merge it.
    for j in range(n - 1):
        targets = list(range(j + 1, n))
        names = [
            (f"{prefix}.{i}.{j}.0.0.weight",
             (3, 3, xs[j].shape[-1],
              channels[i] if i == j + 1 else channels[j]))
            for i in targets
        ]
        bns = [f"{prefix}.{i}.{j}.0.1" for i in targets]
        chunks = _merged_conv(store, names, xs[j], 2, 1,
                              bn_names=bns if folded else None)
        for i, t in zip(targets, chunks):
            if not folded:
                t = batch_norm(store, f"{prefix}.{i}.{j}.0.1", t, train,
                               axis_name=axis_name)
            for k in range(1, i - j):
                t = jax.nn.relu(t)
                last = k == i - j - 1
                out_c = channels[i] if last else channels[j]
                t = conv_bn_relu(store, f"{prefix}.{i}.{j}.{k}.0",
                                 f"{prefix}.{i}.{j}.{k}.1", t, out_c,
                                 3, 2, 1, train, relu=False,
                                 axis_name=axis_name)
            contrib[i].append(t)

    return [jax.nn.relu(sum(ts[1:], ts[0])) for ts in contrib]


def _stage(store, name, xs, stage_key, train, axis_name):
    num_modules, num_branches, num_blocks, chans, block = W48_STAGES[
        stage_key
    ]
    channels = [c * _expansion(block) for c in chans]
    for m in range(num_modules):
        xs = [
            _run_block_seq(
                store, f"{name}.{m}.branches.{b}", xs[b], block, chans[b],
                num_blocks[b], train, axis_name,
            )
            for b in range(num_branches)
        ]
        if num_branches > 1:
            xs = _fuse(store, f"{name}.{m}.fuse_layers", xs, channels,
                       train, axis_name)
    return xs


def _subsample(store, name, x, num_layers, train, axis_name):
    """Stride-2 conv(+bias)-BN-ReLU chain doubling channels each step
    (hrnet.py:376-392)."""
    for i in range(num_layers):
        x = conv_bn_relu(store, f"{name}.{3 * i}", f"{name}.{3 * i + 1}",
                         x, 2 * x.shape[-1], 3, 2, 1, train,
                         axis_name=axis_name, bias=True)
    return x


def _ckpt_section(store: ParamStore, mode: Optional[str], fn, xs):
    """Run ``fn(local_store, xs) -> ys`` under :func:`jax.checkpoint`.

    The param dict is threaded in and the train-mode batch-stat updates
    are threaded OUT as explicit pytree leaves — the store's Python-dict
    side channel would otherwise leak tracers out of the rematerialized
    scope. Identical math; ``mode`` picks what the backward pass saves:

    - ``"stages"``: only the section boundaries — everything inside
      (convs included) is recomputed. Minimum memory, pays the convs
      twice.
    - ``"convs"``: every conv output (tagged ``checkpoint_name`` in
      layers.conv2d) is saved; only the cheap BN/ReLU elementwise
      chains and BN moment reductions are recomputed. ~2x activation
      memory reduction at a few HBM passes of recompute — no conv
      is ever run twice.
    """
    if mode is None:
        return fn(store, xs)
    policy = (jax.checkpoint_policies.save_only_these_names("conv_out")
              if mode == "convs" else None)

    def inner(params, xs):
        local = ParamStore(params)
        local.fold_bn = store.fold_bn
        return fn(local, xs), local.stat_updates

    ys, updates = jax.checkpoint(inner, policy=policy)(store.params, xs)
    store.stat_updates.update(updates)
    return ys


def hrnet_forward(
    params: Dict[str, Array],
    images: Array,
    train: bool = False,
    axis_name: Optional[str] = None,
    return_stages: bool = False,
    old_impl: bool = False,
    fold_bn: Optional[bool] = None,
    remat: str = "none",
    _store: Optional[ParamStore] = None,
) -> Dict[str, Array]:
    """images (B, H, W, 3) -> {'concat': (B, 2048), 'layer1..4': maps}.

    ``fold_bn`` (default: on whenever ``train`` is False) folds every BN
    eval affine into its conv — identical math, 19 ms faster per batch
    of 128 on v5e (see layers.bn_fold_params).

    ``remat`` ("none" | "stages" | "convs"): checkpoint each stage/head
    section (training only) — "stages" recomputes everything inside a
    section in the backward pass, "convs" saves conv outputs and
    recomputes only the elementwise BN/ReLU chains (see _ckpt_section).
    See BENCH.md round-3 train ledger for the measured memory/speed
    trades."""
    store = _store if _store is not None else ParamStore(params)
    if _store is None:
        store.fold_bn = (not train) if fold_bn is None else fold_bn
    if remat in (False, None):  # legacy bool spelling
        remat = "none"
    elif remat is True:
        remat = "stages"
    if remat not in ("none", "stages", "convs"):
        raise ValueError(f"remat must be none|stages|convs, got {remat!r}")
    ck = remat if (remat != "none" and train and not store.init) else None

    def sec_stem(st, images):
        x = conv_bn_relu(st, "conv1", "bn1", images, 64, 3, 2, 1, train,
                         axis_name=axis_name)
        x = conv_bn_relu(st, "conv2", "bn2", x, 64, 3, 2, 1, train,
                         axis_name=axis_name)
        return _run_block_seq(st, "layer1", x, "BOTTLENECK", 64, 4, train,
                              axis_name)

    x = _ckpt_section(store, ck, sec_stem, images)

    def sec_stage2(st, x):
        xs = _transition(st, "transition1", [x], [256],
                         _branch_channels("stage2"), train, axis_name)
        xs = _stage(st, "stage2", xs, "stage2", train, axis_name)
        return _transition(st, "transition2", xs,
                           _branch_channels("stage2"),
                           _branch_channels("stage3"), train, axis_name)

    xs = _ckpt_section(store, ck, sec_stage2, x)

    def sec_stage3(st, xs):
        return _stage(st, "stage3", xs, "stage3", train, axis_name)

    xs = _ckpt_section(store, ck, sec_stage3, xs)
    stage3_out = xs

    def sec_trans3(st, xs):
        return _transition(st, "transition3", xs,
                           _branch_channels("stage3"),
                           _branch_channels("stage4"), train, axis_name)

    xs = _ckpt_section(store, ck, sec_trans3, xs)
    # Head: bring every branch to 1/32 resolution and 384ch, concat, then
    # five Bottleneck(512) layers to 2048 and a global mean pool. In the
    # old_impl topology (ref hrnet.py:463-481) stage4 is built but never
    # run: the head consumes the transition3 outputs directly and the
    # concat has 3*384=1152 channels instead of 4*384.
    if old_impl:
        def sec_head(st, xs):
            x3 = _subsample(st, "subsample_3", xs[1], 2, train, axis_name)
            x2 = _subsample(st, "subsample_2", xs[2], 1, train, axis_name)
            x1 = xs[3]
            return jnp.concatenate([x3, x2, x1], axis=-1)

        feat = _ckpt_section(store, ck, sec_head, xs)
        xs = stage3_out  # 'layer{i}' outputs come from stage3 (ref :467)
    else:
        def sec_stage4(st, xs):
            return _stage(st, "stage4", xs, "stage4", train, axis_name)

        xs = _ckpt_section(store, ck, sec_stage4, xs)

        def sec_head(st, xs):
            x4 = _subsample(st, "subsample_4", xs[0], 3, train, axis_name)
            x3 = _subsample(st, "subsample_3", xs[1], 2, train, axis_name)
            x2 = _subsample(st, "subsample_2", xs[2], 1, train, axis_name)
            x1 = xs[3]
            return jnp.concatenate([x4, x3, x2, x1], axis=-1)

        feat = _ckpt_section(store, ck, sec_head, xs)

    def sec_convlayers(st, feat):
        for i in range(5):
            feat = bottleneck_block(
                st, f"conv_layers.{i}", feat, 512, 1, True, train,
                downsample_has_bn=False, axis_name=axis_name,
            )
        return feat

    feat = _ckpt_section(store, ck, sec_convlayers, feat)
    concat = jnp.mean(feat, axis=(1, 2))

    out = {"concat": concat}
    if return_stages:
        for i, t in enumerate(xs):
            out[f"layer{i + 1}"] = t
    return out


def hrnet_init(
    seed: int = 0, dtype=jnp.float32, old_impl: bool = False
) -> Dict[str, Array]:
    """Create a freshly-initialised W48 param dict (normal std=0.001 convs,
    unit BN — reference init_weights, hrnet.py:500-516)."""
    store = ParamStore(rng=np.random.default_rng(seed), init=True,
                       dtype=dtype)
    dummy = jnp.zeros((1, 64, 64, 3), dtype=dtype)
    hrnet_forward(store.params, dummy, old_impl=old_impl, _store=store)
    return store.params


HRNET_OUTPUT_DIM = 2048

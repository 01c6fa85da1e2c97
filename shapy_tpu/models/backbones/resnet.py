"""ResNet backbones (18/34/50/101/152) — functional, NHWC, torch-named.

Reference: ``regressor/human_shape/models/backbone/resnet.py`` (torchvision
ResNet with the final fc removed; the regressor consumes the global
average-pooled feature). Same param-dict design as :mod:`hrnet`: keys match
torchvision ``state_dict`` names so ImageNet checkpoints import with a
transpose.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from shapy_tpu.models.backbones.layers import (
    ParamStore,
    basic_block,
    bottleneck_block,
    conv_bn_relu,
)

Array = jax.Array

RESNET_LAYERS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}
RESNET_FEAT_DIM = {18: 512, 34: 512, 50: 2048, 101: 2048, 152: 2048}


def resnet_forward(
    params: Dict[str, Array],
    images: Array,
    depth: int = 50,
    train: bool = False,
    axis_name: Optional[str] = None,
    fold_bn: Optional[bool] = None,
    _store: Optional[ParamStore] = None,
) -> Dict[str, Array]:
    store = _store if _store is not None else ParamStore(params)
    if _store is None:
        # Eval-time BN folding (see layers.bn_fold_params).
        store.fold_bn = (not train) if fold_bn is None else fold_bn
    block_kind, layers = RESNET_LAYERS[depth]
    block_fn = basic_block if block_kind == "basic" else bottleneck_block
    expansion = 1 if block_kind == "basic" else 4

    x = conv_bn_relu(store, "conv1", "bn1", images, 64, 7, 2, 3, train,
                     axis_name=axis_name)
    # 3x3 max pool, stride 2, padding 1
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )

    planes = 64
    out = {}
    for stage in range(4):
        stride = 1 if stage == 0 else 2
        for b in range(layers[stage]):
            s = stride if b == 0 else 1
            needs_ds = b == 0 and (s != 1
                                   or x.shape[-1] != planes * expansion)
            x = block_fn(store, f"layer{stage + 1}.{b}", x, planes, s,
                         needs_ds, train, axis_name=axis_name)
        out[f"layer{stage + 1}"] = x
        planes *= 2

    out["avg_pooling"] = jnp.mean(x, axis=(1, 2))
    out["concat"] = out["avg_pooling"]
    return out


def resnet_init(depth: int = 50, seed: int = 0, dtype=jnp.float32
                ) -> Dict[str, Array]:
    store = ParamStore(rng=np.random.default_rng(seed), init=True,
                      dtype=dtype)
    resnet_forward(store.params, jnp.zeros((1, 64, 64, 3), dtype=dtype),
                   depth=depth, _store=store)
    return store.params


def import_resnet_state_dict(state_dict, prefix: str = "", dtype=jnp.float32):
    """Torchvision state dict -> param dict (OIHW -> HWIO transpose)."""
    from shapy_tpu.models.backbones.hrnet_import import (
        import_hrnet_state_dict,
    )

    sd = {k: v for k, v in state_dict.items() if not k.startswith("fc.")}
    return import_hrnet_state_dict(sd, prefix=prefix, dtype=dtype)

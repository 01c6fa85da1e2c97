"""Model evaluation entry point (HBW-val / 3DPW / SSP-3D).

Behavioural spec: reference ``regressor/evaluate.py:44-139`` — layered
config, model build + checkpoint load, val-split dataloaders, Evaluator
run. The reference's torch.distributed scaffolding (rank gating, SyncBN
conversion, evaluate.py:68-105) is replaced by the mesh: the jitted eval
forward is batch-sharded over all devices and metric means are global
(see shapy_tpu/parallel/mesh.py docstring).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict


def main(exp_cfg: Dict, output_folder: str = "evaluation",
         split: str = "val", num_devices_data: int = 0) -> int:
    import jax
    import jax.numpy as jnp

    from shapy_tpu.cli.demo import build_demo_regressor
    from shapy_tpu.data.build import build_all_data_loaders
    from shapy_tpu.eval.evaluator import build_evaluator
    from shapy_tpu.parallel import batch_sharding, make_mesh

    os.makedirs(output_folder, exist_ok=True)

    # Fail fast before the (expensive) model build if no datasets are
    # configured for this split.
    ds_cfg = dict(exp_cfg.get("datasets") or {})
    has_data = any(
        (dict(ds_cfg.get(part) or {}).get("splits") or {}).get(split)
        for part in ("pose", "shape")
    )
    if not has_data:
        print("No evaluation datasets configured", file=sys.stderr)
        return 1

    checkpoint = os.path.expandvars(exp_cfg.get("pretrained", "") or "")
    regressor = build_demo_regressor(exp_cfg, checkpoint)

    loaders = build_all_data_loaders(
        exp_cfg,
        split=split,
        target_keypoint_names=regressor.model.keypoint_names,
        enable_augment=False,
    )
    if not loaders:
        print("No evaluation datasets configured", file=sys.stderr)
        return 1

    mesh = None
    if num_devices_data > 1:
        mesh = make_mesh(data=num_devices_data, model=1)

    @jax.jit
    def forward(params, images, gender):
        return regressor.apply(
            params, images, batch={"gender": gender}
        )

    def model_fn(images, model_batch):
        imgs = jnp.asarray(images)
        gender = jnp.asarray(
            (model_batch or {}).get("gender",
                                    jnp.zeros(imgs.shape[0], jnp.int32))
        )
        if mesh is not None:
            sh = batch_sharding(mesh)
            imgs = jax.device_put(imgs, sh)
            gender = jax.device_put(gender, sh)
        return forward(regressor.params, imgs, gender)

    # Canonical collate->Evaluator field mapping, shared with the
    # in-training eval hook so the two paths cannot drift.
    from shapy_tpu.eval.loop import adapt_eval_batches as adapt

    evaluator = build_evaluator(
        exp_cfg, output_folder=output_folder,
        keypoint_names=regressor.model.keypoint_names)
    with evaluator:
        results = evaluator.run(
            model_fn,
            {part: adapt(loader) for part, loader in loaders.items()},
            last_stage=f"stage_{regressor.num_stages - 1:02d}",
        )
    for ds_name, metrics in results.items():
        print(f"=== {ds_name} ===")
        for name, value in sorted(metrics.items()):
            scale = 1000.0 if any(
                t in name for t in ("v2v", "p2p", "mpjpe", "height_error",
                                    "chest_error", "waist_error",
                                    "hips_error")
            ) else 1.0
            unit = " mm" if scale == 1000.0 else (
                " kg" if "mass" in name else ""
            )
            print(f"{name}: {value * scale:.2f}{unit}")
    return 0


if __name__ == "__main__":
    from shapy_tpu.utils.config import load_config

    parser = argparse.ArgumentParser(
        description="shapy_tpu evaluation",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    # required like the reference's cmd_parser.py:19-21
    parser.add_argument("--exp-cfg", dest="exp_cfgs", nargs="+",
                        required=True)
    parser.add_argument("--exp-opts", dest="exp_opts", nargs="*",
                        default=[])
    parser.add_argument("--output-folder", default="evaluation")
    parser.add_argument("--split", default="val")
    parser.add_argument("--num-devices", type=int, default=0,
                        help="shard eval batches over this many devices")
    args = parser.parse_args()
    cfg = load_config({}, args.exp_cfgs, args.exp_opts)
    from shapy_tpu.utils.device import (exit_on_device_failure,
        raise_open_file_limit)

    raise_open_file_limit()  # reference demo.py:31-32
    exit_on_device_failure()  # reference evaluate.py device gate: exit 3
    sys.exit(main(cfg, args.output_folder, args.split, args.num_devices))

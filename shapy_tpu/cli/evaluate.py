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

    def adapt(loader):
        for batch in loader:
            targets = {}
            if "gt_v_shaped" in batch:
                targets["gt_v_shaped"] = jnp.asarray(batch["gt_v_shaped"])
            # Posed-GT metrics (3DPW v2v, SPIN/EHF mpjpe): the collate
            # emits these under the model's keypoint order.
            if "gt_vertices" in batch:
                targets["gt_vertices"] = jnp.asarray(batch["gt_vertices"])
            if "joints3d" in batch:
                targets["gt_joints3d"] = jnp.asarray(batch["joints3d"])
            if "joints14" in batch:
                targets["gt_joints14"] = jnp.asarray(batch["joints14"])
                if "joints14_valid" in batch:
                    targets["joints14_valid"] = jnp.asarray(
                        batch["joints14_valid"])
            for key in ("height", "chest", "waist", "hips", "mass"):
                gt_key = f"{key}_gt"
                if gt_key in batch:
                    targets[key] = jnp.asarray(batch[gt_key])
            out = {
                "images": batch["images"],
                "targets": targets,
                "model_batch": {"gender": batch["gender"]},
                "genders": batch.get("genders"),
            }
            # BMI histogram groups from GT height/mass (reference
            # evaluation.py:725-729 uses the targets' height/weight).
            if "height_gt" in batch and "mass_gt" in batch:
                from shapy_tpu.eval.evaluator import bmi_hist_group

                out["bmi_hist_groups"] = bmi_hist_group(
                    batch["height_gt"], batch["mass_gt"])
            yield out

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

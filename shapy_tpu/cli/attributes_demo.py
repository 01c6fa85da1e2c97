"""Attribute-model demos: A2S (attributes -> betas) and S2A
(betas -> attribute ratings).

Behavioural spec: reference ``attributes/demo.py:16-127`` — same layered
config (--exp-cfg/--exp-opts), same checkpoint resolution
(``<output_dir>/last.ckpt``), same printed output formats
(per-model predicted betas and the per-attribute rating table).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def run_a2s(cfg, demo_output_folder: str, smpl_model_path: str,
            render: bool = True) -> int:
    from shapy_tpu.models.attributes.a2b import A2B
    from shapy_tpu.models.attributes.demo_data import DemoA2SData

    output_dir = os.path.expandvars(cfg.get("output_dir", "output"))
    checkpoint_path = cfg.get("checkpoint_path") or os.path.join(
        output_dir, "last.ckpt"
    )
    if os.path.exists(checkpoint_path):
        model = A2B.load_from_checkpoint(checkpoint_path, cfg=cfg)
    else:
        print(f"Checkpoint not found: {checkpoint_path}; using "
              "an untrained polynomial", file=sys.stderr)
        model = A2B(cfg)

    dataset = DemoA2SData(
        ds_gender=cfg.get("ds_gender", "female"),
        model_gender=cfg.get("model_gender", "neutral"),
        model_type=cfg.get("model_type", "smplx"),
        rating_folder=cfg.get("rating_folder", "../samples/attributes/"),
    )
    features = model.create_input_feature_vec(dataset.db)
    prediction = model.a2b.predict(model.preprocess(features))

    for idx, betas in enumerate(prediction):
        model_name = dataset.db["ids"][idx]
        print(f"Predicted betas for {model_name}")
        print(betas)

    if render:
        os.makedirs(demo_output_folder, exist_ok=True)
        try:
            from shapy_tpu.models.body import (
                SMPLX,
                make_synthetic_model_data,
            )
            from shapy_tpu.render import render_mesh_overlay

            import cv2
            import jax.numpy as jnp

            if os.path.isdir(os.path.expandvars(smpl_model_path)):
                body = SMPLX(model_folder=smpl_model_path,
                             gender=cfg.get("model_gender", "neutral"))
            else:
                body = SMPLX(model_data=make_synthetic_model_data(
                    "smplx", subdivisions=4))
            v = body.forward_shape(
                jnp.asarray(prediction, jnp.float32))["v_shaped"]
            for idx in range(len(prediction)):
                verts = np.asarray(v[idx])
                verts = (verts - verts.mean(0)) * [1, -1, -1]
                verts[:, 2] += 2.5
                img = render_mesh_overlay(
                    np.ones((512, 512, 3), np.float32), verts, body.faces,
                    focal_length=500.0,
                    # lit anti-aliased look (reference pyrender Renderer,
                    # attributes/utils/renderer.py)
                    shading_mode="phong", supersample=2,
                )
                cv2.imwrite(
                    os.path.join(demo_output_folder,
                                 f"{dataset.db['ids'][idx]}.png"),
                    cv2.cvtColor((np.clip(img, 0, 1) * 255).astype(
                        np.uint8), cv2.COLOR_RGB2BGR),
                )
        except Exception as e:  # rendering is best-effort
            print(f"Rendering skipped: {e}", file=sys.stderr)
    return 0


def run_s2a(cfg, demo_output_folder: str) -> int:
    from shapy_tpu.models.attributes.b2a import B2A
    from shapy_tpu.models.attributes.demo_data import DemoS2AData

    output_dir = os.path.expandvars(cfg.get("output_dir", "output"))
    checkpoint_path = cfg.get("checkpoint_path") or os.path.join(
        output_dir, "last.ckpt"
    )
    if os.path.exists(checkpoint_path):
        model = B2A.load_from_checkpoint(checkpoint_path, cfg=cfg)
    else:
        print(f"Checkpoint not found: {checkpoint_path}; using "
              "an untrained polynomial", file=sys.stderr)
        model = B2A(cfg)

    dataset = DemoS2AData(
        betas_folder=cfg.get("betas_folder", "../samples/shapy_fit/"),
        ds_genders_path=cfg.get("ds_genders_path",
                                "../samples/genders.yaml"),
        model_gender=cfg.get("model_gender", "neutral"),
        model_type=cfg.get("model_type", "smplx"),
    )
    ds_gender = cfg.get("ds_gender", "female")
    dataset.create_db(ds_gender)

    test_input = dataset.db[dataset.betas_key][:, : model.betas_size]
    if len(test_input) == 0:
        print(f"No {ds_gender} samples found", file=sys.stderr)
        return 1
    prediction = model.b2a.predict(test_input)

    output_names = model.output_names
    for img_idx, img_id in enumerate(dataset.db["filename"]):
        print(f"\n Results for image {img_id}")
        for name, estimate in zip(output_names, prediction[img_idx]):
            print(f"{name:20s}: {float(estimate):.2f}")
    return 0


def main(cfg, demo_output_folder: str = "demo_output",
         smpl_model_path: str = "../data/body_models",
         render: bool = True) -> int:
    network_type = cfg.get("type", "a2b")
    if network_type == "a2b":
        return run_a2s(cfg, demo_output_folder, smpl_model_path, render)
    if network_type == "b2a":
        return run_s2a(cfg, demo_output_folder)
    raise ValueError(f"Unknown attribute model type: {network_type}")


if __name__ == "__main__":
    from shapy_tpu.utils.config import load_config

    parser = argparse.ArgumentParser(
        description="A2S / S2A demos",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--exp-cfg", dest="exp_cfgs", nargs="+",
                        default=[])
    parser.add_argument("--exp-opts", dest="exp_opts", nargs="*",
                        default=[])
    # Underscore spellings are the reference's exact flags
    # (attributes/demo.py:140-143); keep both.
    parser.add_argument("--demo-output-folder", "--demo_output_folder",
                        default="../samples/attributes/predictions")
    parser.add_argument("--smpl-model-path", "--smpl_model_path",
                        default="../data/body_models")
    parser.add_argument("--no-render", dest="render",
                        action="store_false")
    args = parser.parse_args()
    cfg = load_config({}, args.exp_cfgs, args.exp_opts)
    sys.exit(main(cfg, args.demo_output_folder, args.smpl_model_path,
                  args.render))

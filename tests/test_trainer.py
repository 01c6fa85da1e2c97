import json
import os

import numpy as np
import pytest


def make_agency_root(tmp_path, rng, n_models=3, imgs_per_model=2):
    import cv2

    root = tmp_path / "agency"
    annotations = {}
    for m in range(n_models):
        key = f"m{m}"
        images = {}
        for i in range(imgs_per_model):
            fname = f"{key}_{i}.jpg"
            path = root / "acme" / "images" / key / fname
            os.makedirs(path.parent, exist_ok=True)
            img = (rng.uniform(size=(120, 100, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(path), img)
            kp = np.zeros((135, 3))
            kp[:25, 0] = rng.uniform(20, 80, 25)
            kp[:25, 1] = rng.uniform(20, 100, 25)
            kp[:25, 2] = 0.9
            images[fname] = kp.tolist()
        annotations[key] = {
            "agency": "acme",
            "gender": ["male", "female", "neutral"][m % 3],
            "height": 1.6 + 0.1 * m,
            "attributes": list(np.linspace(1, 5, 15)),
            "images": images,
        }
    with open(root / "annotations.json", "w") as f:
        json.dump(annotations, f)
    with open(root / "splits.json", "w") as f:
        json.dump({"train": [f"m{m}" for m in range(n_models)]}, f)
    return str(root)


def test_trainer_end_to_end(tmp_path, rng):
    """Full train CLI path on a synthetic model-agency dataset."""
    from shapy_tpu.cli.train import main

    root = make_agency_root(tmp_path, rng)
    os.environ["SHAPY_TPU_SYNTHETIC_BODY"] = "1"
    cfg = {
        "body_model": {"type": "smplx", "model_folder": "",
                       "smplx": {"betas": {"num": 10}}},
        "network": {
            "type": "SMPLXRegressor",
            "smplx": {
                "num_stages": 2,
                "predict_hands": False,
                "predict_face": False,
                "backbone": {"type": "resnet", "depth": 18},
                "mlp": {"layers": [32], "dropout": 0.0},
            },
        },
        "datasets": {
            "batch_size": 2,
            "pose_shape_ratio": 0.0,  # shape stream only
            "shape": {
                "splits": {"train": ["model_agencies"]},
                "transforms": {"crop_size": 64},
                "model_agencies": {"data_folder": root},
            },
        },
        "losses": {
            "body": {
                "body_joints_2d": {"weight": 1.0},
                "height": {"weight": 1.0},
                "stages_to_penalize": ["stage_01"],
            }
        },
        "optim": {"type": "adam", "lr": 1e-4, "num_steps": 3},
        "summary_steps": 1,
        "checkpoint_steps": 2,
    }
    # Patch the demo builder to use a tiny synthetic body (subdiv 2)
    import shapy_tpu.cli.demo as demo_mod
    from shapy_tpu.models.body import SMPLX, make_synthetic_model_data
    from shapy_tpu.measure import BodyMeasurements, MeasurementAnchors
    from shapy_tpu.models.heads import build_body_head

    def tiny_builder(exp_cfg, checkpoint_path=""):
        body = SMPLX(model_data=make_synthetic_model_data(
            "smplx", subdivisions=1))
        anchors = MeasurementAnchors.synthetic(
            body.faces, np.asarray(body.params["v_template"]))
        return build_body_head(
            exp_cfg, body_model=body,
            measurements=BodyMeasurements(anchors=anchors,
                                          num_hull_directions=64),
        )

    orig = demo_mod.build_demo_regressor
    demo_mod.build_demo_regressor = tiny_builder
    try:
        rc = main(cfg, output_folder=str(tmp_path / "out"), num_steps=3)
    finally:
        demo_mod.build_demo_regressor = orig
    assert rc == 0
    ckpt_dir = tmp_path / "out" / "checkpoints"
    assert os.path.exists(ckpt_dir / "latest_checkpoint")


def test_profiling_utils():
    from shapy_tpu.utils.profiling import annotate, device_memory_stats

    with annotate("test-block"):
        pass
    stats = device_memory_stats()
    assert isinstance(stats, dict)

import json
import os

import numpy as np
import pytest
import yaml


@pytest.fixture()
def hbw_tree(tmp_path, rng):
    """Fake HBW data tree with 2 subjects x 2 images + GT meshes."""
    import cv2

    from shapy_tpu.models.body.assets import icosphere

    root = tmp_path / "hbw"
    verts, faces = icosphere(1)
    genders = {}
    for si, gender in enumerate(["female", "male"]):
        sid = f"s{si:03d}"
        genders[sid] = gender
        mesh_dir = root / "v_templates" / "smplx" / "val"
        os.makedirs(mesh_dir, exist_ok=True)
        scale = 1.0 + 0.05 * si
        with open(mesh_dir / f"{sid}.obj", "w") as f:
            for v in verts * scale:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
            for tri in faces + 1:
                f.write(f"f {tri[0]} {tri[1]} {tri[2]}\n")
        for ii in range(2):
            img_dir = root / "photos" / "val" / f"{sid}_x" / "studio"
            kp_dir = root / "keypoints" / "val" / f"{sid}_x" / "studio"
            os.makedirs(img_dir, exist_ok=True)
            os.makedirs(kp_dir, exist_ok=True)
            img = (rng.uniform(size=(120, 100, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(img_dir / f"img{ii}.jpg"), img)
            body = np.zeros((25, 3))
            body[:, 0] = rng.uniform(20, 80, 25)
            body[:, 1] = rng.uniform(20, 100, 25)
            body[:, 2] = 0.9
            with open(kp_dir / f"img{ii}.json", "w") as f:
                json.dump(
                    {"people": [{"pose_keypoints_2d":
                                 body.reshape(-1).tolist()}]}, f
                )
    with open(root / "genders.yaml", "w") as f:
        yaml.safe_dump(genders, f)
    return str(root), faces


def test_evaluate_cli_end_to_end(tmp_path, hbw_tree, rng, capsys):
    """Full evaluate CLI on the fake HBW tree with a tiny regressor."""
    root, faces = hbw_tree

    import shapy_tpu.cli.demo as demo_mod
    from shapy_tpu.cli.evaluate import main
    from shapy_tpu.measure import BodyMeasurements, MeasurementAnchors
    from shapy_tpu.models.body import SMPLX, make_synthetic_model_data
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
            "batch_size": 4,
            "pose_shape_ratio": 0.0,
            "shape": {
                "splits": {"val": ["hbw"]},
                "transforms": {"crop_size": 64},
                "hbw": {"data_folder": root},
            },
        },
    }

    # The tiny synthetic body (42 verts) matches the fake GT meshes, so
    # v2v_t and gt measurements are computable end to end.
    orig = demo_mod.build_demo_regressor
    demo_mod.build_demo_regressor = tiny_builder

    # HBW dataset computes GT measurements only when given a measurement
    # module; patch the registry entry to inject it.
    from shapy_tpu.data import build as build_mod
    from shapy_tpu.data.datasets.hbw import HBWDataset

    build_mod._populate_registry()
    body_tmp = SMPLX(model_data=make_synthetic_model_data(
        "smplx", subdivisions=1))
    anchors = MeasurementAnchors.synthetic(
        body_tmp.faces, np.asarray(body_tmp.params["v_template"]))
    meas = BodyMeasurements(anchors=anchors, num_hull_directions=64)

    class HBWWithMeas(HBWDataset):
        def __init__(self, **kwargs):
            super().__init__(
                measurements_module=meas,
                body_model_faces=body_tmp.faces,
                **kwargs,
            )

    build_mod.DATASET_REGISTRY["hbw"] = HBWWithMeas
    try:
        rc = main(cfg, output_folder=str(tmp_path / "eval_out"),
                  split="val")
    finally:
        demo_mod.build_demo_regressor = orig
        build_mod.DATASET_REGISTRY["hbw"] = HBWDataset
    assert rc == 0
    out = capsys.readouterr().out
    assert "v2v_t" in out
    assert "height_error" in out


def test_evaluate_cli_no_datasets(tmp_path):
    from shapy_tpu.cli.evaluate import main

    rc = main({"datasets": {}}, output_folder=str(tmp_path / "none"))
    assert rc == 1


def test_evaluate_cli_threedpw_mpjpe14(tmp_path, rng, capsys):
    """3DPW-protocol eval through the CLI: the j14_regressor_path config
    (reference defaults.py:76, evaluation.py:621-635) produces reported
    mpjpe14 metrics from the dataset's LSP-14 GT joints
    (threedpw.py:209-212)."""
    import cv2

    import shapy_tpu.cli.demo as demo_mod
    from shapy_tpu.cli.evaluate import main
    from shapy_tpu.models.body import SMPLX, make_synthetic_model_data
    from shapy_tpu.models.heads import build_body_head

    # fake 3DPW tree: npz_data/test.npz + images/
    root = tmp_path / "3dpw"
    n = 3
    os.makedirs(root / "npz_data", exist_ok=True)
    os.makedirs(root / "images" / "seq0", exist_ok=True)
    imgnames = []
    for i in range(n):
        name = f"seq0/image_{i:05d}.jpg"
        imgnames.append(name)
        img = (rng.uniform(size=(128, 96, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(root / "images" / name), img)
    np.savez(
        root / "npz_data" / "test.npz",
        imgname=np.asarray(imgnames),
        center=np.tile(np.asarray([48.0, 64.0], np.float32), (n, 1)),
        scale=np.full((n,), 0.5, np.float32),
        pose=rng.normal(size=(n, 72)).astype(np.float32) * 0.1,
        shape=rng.normal(size=(n, 10)).astype(np.float32) * 0.5,
        gender=np.asarray(["m", "f", "m"]),
        joints3d=rng.normal(size=(n, 24, 3)).astype(np.float32),
    )

    body = SMPLX(model_data=make_synthetic_model_data(
        "smplx", subdivisions=1))
    V = np.asarray(body.params["v_template"]).shape[0]
    j14 = rng.uniform(size=(20, V)).astype(np.float32)  # truncated to 14
    j14 /= j14.sum(1, keepdims=True)
    j14_path = tmp_path / "j14.npy"
    np.save(j14_path, j14)

    def tiny_builder(exp_cfg, checkpoint_path=""):
        return build_body_head(exp_cfg, body_model=body)

    cfg = {
        "body_model": {"type": "smplx", "model_folder": "",
                       "smplx": {"betas": {"num": 10}}},
        "j14_regressor_path": str(j14_path),
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
            "batch_size": 3,
            "pose_shape_ratio": 1.0,
            "pose": {
                "splits": {"test": ["threedpw"]},
                "transforms": {"crop_size": 64},
                "threedpw": {"data_folder": str(root)},
            },
        },
    }

    orig = demo_mod.build_demo_regressor
    demo_mod.build_demo_regressor = tiny_builder
    try:
        rc = main(cfg, output_folder=str(tmp_path / "eval_out"),
                  split="test")
    finally:
        demo_mod.build_demo_regressor = orig
    assert rc == 0
    out = capsys.readouterr().out
    assert "mpjpe14_root" in out
    assert "mpjpe14_procrustes" in out

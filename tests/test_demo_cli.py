"""Demo CLI: batch-1 reference behaviour and the batched fused-crop path.

Runs on the real reference samples (images + OpenPose JSONs) with a tiny
synthetic-body regressor. Checks the npz output schema stays identical
between batch sizes (reference demo.py:321-353 schema) and that the
fused on-device crop path produces results close to the host-crop path.
"""

import os

import numpy as np
import pytest

SAMPLES = "/root/reference/samples"


def _demo_cfg():
    return {
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
            "crop_size": 64,
            "pose": {
                "openpose": {
                    "data_folder": SAMPLES,
                    "img_folder": "images",
                    "keyp_folder": "openpose",
                }
            },
        },
    }


@pytest.mark.skipif(not os.path.isdir(SAMPLES), reason="no samples")
def test_demo_batch1_vs_batched(tmp_path, monkeypatch):
    import shapy_tpu.cli.demo as demo_mod

    from shapy_tpu.measure import BodyMeasurements, MeasurementAnchors
    from shapy_tpu.models.body import SMPLX, make_synthetic_model_data
    from shapy_tpu.models.heads import build_body_head

    body = SMPLX(model_data=make_synthetic_model_data(
        "smplx", subdivisions=1))
    anchors = MeasurementAnchors.synthetic(
        body.faces, np.asarray(body.params["v_template"]))
    meas = BodyMeasurements(anchors=anchors, num_hull_directions=64)
    built = {}

    def builder(cfg, ckpt=""):
        if "reg" not in built:
            built["reg"] = build_body_head(
                _demo_cfg(), body_model=body, measurements=meas
            )
        return built["reg"]

    monkeypatch.setattr(demo_mod, "build_demo_regressor", builder)

    out1 = tmp_path / "b1"
    out4 = tmp_path / "b4"
    rc = demo_mod.main(_demo_cfg(), demo_output_folder=str(out1),
                       save_vis=False, save_params=True, save_mesh=True,
                       batch_size=1)
    assert rc == 0
    rc = demo_mod.main(_demo_cfg(), demo_output_folder=str(out4),
                       save_vis=False, save_params=True, save_mesh=True,
                       batch_size=4)
    assert rc == 0

    npz1 = sorted(p for p in os.listdir(out1) if p.endswith(".npz"))
    npz4 = sorted(p for p in os.listdir(out4) if p.endswith(".npz"))
    assert npz1 == npz4 and len(npz1) >= 2

    for name in npz1:
        with np.load(out1 / name, allow_pickle=True) as d1, \
                np.load(out4 / name, allow_pickle=True) as d4:
            # byte-compatible schema: identical keys and shapes
            assert sorted(d1.files) == sorted(d4.files)
            for k in d1.files:
                a, b = d1[k], d4[k]
                assert a.shape == b.shape, (name, k)
            # fused on-device crop ~ host cv2 crop: same prediction up to
            # interpolation differences
            np.testing.assert_allclose(
                d1["betas"], d4["betas"], atol=0.15
            )
        # meshes written for both
        assert os.path.exists(out4 / name.replace(".npz", ".ply"))


@pytest.mark.skipif(not os.path.isdir(SAMPLES), reason="no samples")
def test_demo_npz_roundtrip_through_virtual_measurements(
        tmp_path, monkeypatch):
    """Value-level golden for the demo npz (reference demo.py:321-353):

    run cli/demo.py, re-load its npz through cli/virtual_measurements.py
    (the betas path), and independently recompute measurements from the
    SAVED v_shaped — both must agree with the npz's stored measurements.
    This locks the npz schema AND the save-path unit conventions
    (metres/kg, v_shaped meaning) end to end.
    """
    import jax.numpy as jnp

    import shapy_tpu.cli.demo as demo_mod
    import shapy_tpu.cli.virtual_measurements as vm_mod
    from shapy_tpu.measure import BodyMeasurements, MeasurementAnchors
    from shapy_tpu.models.body import SMPLX, make_synthetic_model_data
    from shapy_tpu.models.heads import build_body_head

    subdiv = 2
    body = SMPLX(model_data=make_synthetic_model_data(
        "smplx", subdivisions=subdiv))
    anchors = MeasurementAnchors.synthetic(
        body.faces, np.asarray(body.params["v_template"]))
    meas = BodyMeasurements(anchors=anchors, num_hull_directions=64)

    def builder(cfg, ckpt=""):
        return build_body_head(_demo_cfg(), body_model=body,
                               measurements=meas)

    monkeypatch.setattr(demo_mod, "build_demo_regressor", builder)
    out_dir = tmp_path / "demo"
    rc = demo_mod.main(_demo_cfg(), demo_output_folder=str(out_dir),
                       save_vis=False, save_params=True, save_mesh=False,
                       batch_size=1)
    assert rc == 0
    npzs = sorted(p for p in os.listdir(out_dir) if p.endswith(".npz"))
    assert npzs

    # 1. The actual virtual_measurements CLI consumes the demo npzs
    #    (betas -> forward_shape -> measurements) against the same
    #    synthetic body.
    monkeypatch.setenv("SHAPY_TPU_SYNTHETIC_BODY", "1")
    monkeypatch.setenv("SHAPY_TPU_TEST_SUBDIV", str(subdiv))
    vm_out = tmp_path / "vm"
    rc = vm_mod.main(
        demo_input_folder=str(out_dir), demo_output_folder=str(vm_out),
        render=False,
    )
    assert rc == 0

    # 2. Value-level: measurements recomputed from the SAVED v_shaped
    #    match the measurements stored in the npz.
    for name in npzs:
        with np.load(out_dir / name, allow_pickle=True) as d:
            stored = d["measurements"].item()
            v_shaped = jnp.asarray(d["v_shaped"])[None]
            betas = jnp.asarray(d["betas"]).reshape(1, -1)
        recomputed = meas.forward_from_vertices(
            v_shaped, body.faces)["measurements"]
        for key in ("mass", "height", "chest", "waist", "hips"):
            got = float(np.asarray(recomputed[key]["tensor"])[0])
            want = float(np.asarray(stored[key]).reshape(-1)[0])
            # mass in kg (~1e2), lengths in m: 1e-3 relative covers f32
            # accumulation-order differences only.
            assert abs(got - want) <= 1e-3 * max(abs(want), 1.0), (
                name, key, got, want)
        # and the betas in the npz regenerate the saved v_shaped
        v_regen = body.forward_shape(betas)["v_shaped"]
        np.testing.assert_allclose(
            np.asarray(v_regen[0]), np.asarray(v_shaped[0]), atol=2e-5)


def test_demo_save_vis_reference_filenames(tmp_path, monkeypatch):
    """save_vis writes the reference demo's output-file surface
    (demo.py:253-325): {img}_hd_imgs.png, {img}_hd_{stage}_overlay.png
    (RGBA), {img}_hd_{stage}_cat.png ([orig|overlay], double width)."""
    import json

    import cv2

    import shapy_tpu.cli.demo as demo_mod
    from shapy_tpu.measure import BodyMeasurements, MeasurementAnchors
    from shapy_tpu.models.body import SMPLX, make_synthetic_model_data
    from shapy_tpu.models.heads import build_body_head

    # tiny synthetic input: one 96x72 image + openpose json
    data = tmp_path / "data"
    (data / "images").mkdir(parents=True)
    (data / "openpose").mkdir()
    rng = np.random.default_rng(0)
    img = (rng.uniform(size=(96, 72, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(data / "images" / "img_00.png"), img)
    kp = np.zeros((25, 3), np.float32)
    kp[:, 0] = 36.0 + 20.0 * np.sin(np.linspace(0, 6, 25))
    kp[:, 1] = np.linspace(10, 86, 25)
    kp[:, 2] = 0.9
    json.dump({"people": [{"pose_keypoints_2d": kp.reshape(-1).tolist()}]},
              open(data / "openpose" / "img_00.json", "w"))

    cfg = dict(_demo_cfg())
    cfg["datasets"] = {
        "crop_size": 64,
        "pose": {"openpose": {"data_folder": str(data),
                              "img_folder": "images",
                              "keyp_folder": "openpose"}},
    }
    body = SMPLX(model_data=make_synthetic_model_data(
        "smplx", subdivisions=1))
    anchors = MeasurementAnchors.synthetic(
        body.faces, np.asarray(body.params["v_template"]))
    meas = BodyMeasurements(anchors=anchors, num_hull_directions=64)

    def builder(c, ckpt=""):
        return build_body_head(cfg, body_model=body, measurements=meas)

    monkeypatch.setattr(demo_mod, "build_demo_regressor", builder)
    out_dir = tmp_path / "out"
    rc = demo_mod.main(cfg, demo_output_folder=str(out_dir),
                       save_vis=True, save_params=False, save_mesh=False,
                       batch_size=1)
    assert rc == 0

    last = "stage_01"  # _demo_cfg uses num_stages=2
    hd = cv2.imread(str(out_dir / "img_00_hd_imgs.png"))
    assert hd is not None and hd.shape[:2] == (96, 72)
    ov = cv2.imread(str(out_dir / f"img_00_hd_{last}_overlay.png"),
                    cv2.IMREAD_UNCHANGED)
    assert ov is not None and ov.shape == (96, 72, 4)  # RGBA
    cat = cv2.imread(str(out_dir / f"img_00_hd_{last}_cat.png"))
    assert cat is not None and cat.shape[:2] == (96, 144)
    # the overlay actually drew a body: it differs from the raw image
    assert np.abs(ov[..., :3].astype(int) - hd.astype(int)).max() > 20

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, env=None, timeout=400):
    e = dict(os.environ)
    e["PYTHONPATH"] = REPO
    e["JAX_PLATFORMS"] = "cpu"
    e["SHAPY_TPU_SYNTHETIC_BODY"] = "1"
    e["SHAPY_TPU_TEST_SUBDIV"] = "2"
    if env:
        e.update(env)
    return subprocess.run(
        [sys.executable] + args, capture_output=True, text=True,
        timeout=timeout, env=e, cwd=REPO,
    )


def test_fit_regression_train_and_eval(tmp_path):
    from shapy_tpu.cli.fit_regression import main

    cfg = {
        "type": "b2a",
        "use_synthetic_db": True,
        "output_dir": str(tmp_path),
        "ds_gender": "female",
        "model_gender": "neutral",
        "model_type": "smplx",
        "num_shape_comps": 10,
        "use_attributes": True,
        "use_measurements": False,
        "female_attributes": {
            k: True for k in (
                "big", "broad_shoulders", "feminine", "large_breasts",
                "long_legs", "long_neck", "long_torso", "muscular",
                "pear_shaped", "petite", "short", "short_arms",
                "skinny_legs", "slim_waist", "tall",
            )
        },
        "network": {"type": "polynomial",
                    "polynomial": {"degree": 2, "alpha": 0.0}},
    }
    assert main(cfg, train=True) == 0
    assert os.path.exists(os.path.join(str(tmp_path), "last.ckpt.npz"))
    assert main(cfg, train=False) == 0


def test_fit_regression_a2b_synthetic(tmp_path):
    from shapy_tpu.cli.fit_regression import main

    cfg = {
        "type": "a2b",
        "use_synthetic_db": True,
        "output_dir": str(tmp_path),
        "ds_gender": "female",
        "model_gender": "neutral",
        "model_type": "smplx",
        "num_shape_comps": 10,
        "bodytalk_meas_preprocess": True,
        "regression": {"use_whw2s_setting": False},
        "use_attributes": True,
        "use_measurements": True,
        "female_attributes": {
            k: True for k in (
                "big", "broad_shoulders", "feminine", "large_breasts",
                "long_legs", "long_neck", "long_torso", "muscular",
                "pear_shaped", "petite", "short", "short_arms",
                "skinny_legs", "slim_waist", "tall",
            )
        },
        "measurements": {"height_gt": True, "weight_gt": True,
                         "height_bg": False, "weight_bg": False,
                         "chest": False, "waist": False, "hips": False},
        "network": {"type": "polynomial",
                    "polynomial": {"degree": 2, "alpha": 1.0}},
    }
    assert main(cfg, train=True) == 0
    assert main(cfg, train=False) == 0


def test_attributes_s2a_demo(capsys, tmp_path):
    from shapy_tpu.cli.attributes_demo import main

    # Build demo inputs: two betas npzs + genders yaml
    betas_dir = tmp_path / "fits"
    os.makedirs(betas_dir)
    rng = np.random.default_rng(0)
    import yaml

    genders = {}
    for i in range(2):
        np.savez(betas_dir / f"img_{i:02d}.npz",
                 betas=rng.normal(size=10).astype(np.float32))
        genders[f"img_{i:02d}"] = "female" if i else "male"
    with open(tmp_path / "genders.yaml", "w") as f:
        yaml.safe_dump(genders, f)

    cfg = {
        "type": "b2a",
        "output_dir": str(tmp_path / "nonexistent"),
        "ds_gender": "female",
        "model_gender": "neutral",
        "model_type": "smplx",
        "num_shape_comps": 10,
        "use_attributes": True,
        "use_measurements": False,
        "female_attributes": {
            k: True for k in ("big", "tall", "short")
        },
        "betas_folder": str(betas_dir),
        "ds_genders_path": str(tmp_path / "genders.yaml"),
        "network": {"type": "polynomial",
                    "polynomial": {"degree": 2}},
    }
    assert main(cfg, str(tmp_path / "out"), render=False) == 0
    out = capsys.readouterr().out
    assert "Results for image img_01" in out


def test_attributes_a2s_demo(capsys, tmp_path):
    from shapy_tpu.cli.attributes_demo import main

    cfg = {
        "type": "a2b",
        "output_dir": str(tmp_path / "none"),
        "ds_gender": "female",
        "model_gender": "neutral",
        "model_type": "smplx",
        "num_shape_comps": 10,
        "use_attributes": True,
        "use_measurements": True,
        "rating_folder": "/root/reference/samples/attributes/",
        "female_attributes": {
            k: True for k in (
                "big", "broad_shoulders", "feminine", "large_breasts",
                "long_legs", "long_neck", "long_torso", "muscular",
                "pear_shaped", "petite", "short", "short_arms",
                "skinny_legs", "slim_waist", "tall",
            )
        },
        "measurements": {"height_gt": True, "chest": True, "waist": True,
                         "hips": True},
        "network": {"type": "polynomial",
                    "polynomial": {"degree": 2}},
    }
    assert main(cfg, str(tmp_path / "out"), render=False) == 0
    out = capsys.readouterr().out
    assert "Predicted betas" in out


def test_hbw_submission_checker(tmp_path):
    from shapy_tpu.cli.evaluate_hbw import check_submission_format

    good = tmp_path / "good.npz"
    np.savez(good, image_name=np.asarray(["a", "b"]),
             v_shaped=np.zeros((2, 10475, 3), np.float32))
    assert check_submission_format(str(good))

    bad = tmp_path / "bad.npz"
    np.savez(bad, image_name=np.asarray(["a"]),
             v_shaped=np.zeros((2, 100, 3), np.float32))
    assert not check_submission_format(str(bad))


def test_evaluate_hbw_offline(tmp_path, rng):
    """Offline HBW eval on a synthetic submission + GT tree."""
    from shapy_tpu.cli.evaluate_hbw import evaluate_submission
    from shapy_tpu.measure import BodyMeasurements, MeasurementAnchors
    from shapy_tpu.models.body import SMPLX, make_synthetic_model_data

    body = SMPLX(model_data=make_synthetic_model_data(
        "smplx", subdivisions=2))
    anchors = MeasurementAnchors.synthetic(
        body.faces, np.asarray(body.params["v_template"]))
    meas = BodyMeasurements(anchors=anchors, num_hull_directions=64)

    import jax.numpy as jnp

    betas = jnp.asarray(rng.normal(size=(3, 10)), jnp.float32)
    gt_v = np.asarray(body.forward_shape(betas)["v_shaped"])
    fits = gt_v + rng.normal(size=gt_v.shape).astype(np.float32) * 0.002

    labels = [f"val/s{i:03d}_x/studio/img.jpg" for i in range(3)]
    lookup = {l: gt_v[i] for i, l in enumerate(labels)}

    results = evaluate_submission(
        labels, fits, lambda l: lookup[l],
        model_type="smplx",
        measurements_gt=meas, measurements_fit=meas,
        gt_faces=body.faces, fit_faces=body.faces,
        batch_size=2,
    )
    assert results["v2v_t"] < 0.004
    assert results["height_error"] < 0.02


def test_all_a2s_variation_configs_fit(tmp_path):
    """Every shipped a2s_variations config (the reference's 11-variant
    polynomial A2S matrix, attributes/configs/a2s_variations_polynomial/)
    trains and evaluates on the synthetic DB."""
    import yaml

    from shapy_tpu.cli.fit_regression import main

    cfg_dir = os.path.join(REPO, "configs", "a2s_variations")
    names = sorted(os.listdir(cfg_dir))
    assert len(names) == 11
    for name in names:
        with open(os.path.join(cfg_dir, name)) as f:
            cfg = yaml.safe_load(f)
        cfg["use_synthetic_db"] = True
        cfg["output_dir"] = str(tmp_path / name)
        assert main(cfg, train=True) == 0, name
        assert os.path.exists(
            os.path.join(str(tmp_path / name), "last.ckpt.npz")
        ), name


def test_examples_smoke(tmp_path):
    """The examples/ scripts run end-to-end on synthetic assets."""
    out = run_cli(
        ["examples/fit_measurements.py", "--height", "1.8",
         "--num-steps", "5"],
        timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "fitted" in out.stdout

    png = str(tmp_path / "vis.png")
    out = run_cli(
        ["examples/vis_measurements.py", "--output", png],
        timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert os.path.exists(png)


def test_import_checkpoint_cli(tmp_path):
    """torch checkpoint -> orbax conversion CLI: converts and the orbax
    checkpoint round-trips through Checkpointer.load."""
    import torch

    from shapy_tpu.cli.demo import build_demo_regressor
    from shapy_tpu.io.checkpoint import Checkpointer

    os.environ.setdefault("SHAPY_TPU_SYNTHETIC_BODY", "1")
    os.environ.setdefault("SHAPY_TPU_TEST_SUBDIV", "2")
    cfg = {"network": {"smplx": {
        "num_stages": 2, "predict_hands": False, "predict_face": False,
        "backbone": {"type": "resnet", "depth": 18},
        "mlp": {"layers": [32], "dropout": 0.0},
    }}}
    reg = build_demo_regressor(cfg)

    rng = np.random.default_rng(0)
    sd = {}
    for k, v in reg.params["backbone"].items():
        arr = rng.normal(size=np.asarray(v).shape).astype(np.float32)
        if k.endswith("running_var"):
            arr = np.abs(arr) + 0.5
        if k.endswith(".weight") and arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)
        sd[f"backbone.{k}"] = torch.tensor(arr)
    for k, v in reg.params["head"].items():
        sd[f"regressor.module.{k}"] = torch.tensor(
            rng.normal(size=np.asarray(v).shape).astype(np.float32))
    torch_path = str(tmp_path / "ckpt.pt")
    torch.save({"model": sd}, torch_path)

    import yaml

    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    outdir = str(tmp_path / "converted")
    out = run_cli(
        ["-m", "shapy_tpu.cli.import_checkpoint",
         "--torch-checkpoint", torch_path, "--exp-cfg", cfg_path,
         "--output-dir", outdir],
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "wrote" in out.stdout

    loaded = Checkpointer(save_dir=outdir).load(
        template={"params": reg.params})
    assert loaded is not None
    got = np.asarray(loaded["params"]["backbone"]["conv1.weight"])
    want = np.asarray(sd["backbone.conv1.weight"]).transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_build_demo_regressor_perf_knobs():
    """network.smplx compute_dtype / remat YAML keys reach the regressor —
    the measured BENCH.md train configuration (bf16 backbone, big-batch
    remat) is reachable from config, not only from the perf tools."""
    import jax.numpy as jnp

    from shapy_tpu.cli.demo import build_demo_regressor

    os.environ.setdefault("SHAPY_TPU_SYNTHETIC_BODY", "1")
    os.environ.setdefault("SHAPY_TPU_TEST_SUBDIV", "2")
    sub = {
        "num_stages": 2, "predict_hands": False, "predict_face": False,
        "backbone": {"type": "resnet", "depth": 18},
        "mlp": {"layers": [32], "dropout": 0.0},
        "compute_dtype": "bfloat16", "remat": "convs",
    }
    reg = build_demo_regressor({"network": {"smplx": sub}})
    assert reg.backbone_compute_dtype == jnp.bfloat16
    assert reg.backbone_remat == "convs"

    with pytest.raises(ValueError, match="compute_dtype"):
        build_demo_regressor(
            {"network": {"smplx": dict(sub, compute_dtype="fp8")}})


def test_device_failure_exit_code():
    """Reference demo.py:136-139,155-159: accelerator-init failure exits
    with code 3 so cluster schedulers resubmit instead of flagging a job
    bug. A working CPU backend is a platform choice, not a failure."""
    bad = ("import jax; jax.config.update('jax_platforms','bogus'); "
           "from shapy_tpu.utils.device import exit_on_device_failure; "
           "exit_on_device_failure()")
    out = run_cli(["-c", bad])
    assert out.returncode == 3, (out.returncode, out.stderr[-500:])
    assert "initialisation failed" in out.stderr

    good = ("import jax; jax.config.update('jax_platforms','cpu'); "
            "from shapy_tpu.utils.device import exit_on_device_failure; "
            "exit_on_device_failure(); print('devices ok')")
    out = run_cli(["-c", good])
    assert out.returncode == 0, out.stderr[-500:]
    assert "devices ok" in out.stdout


def test_export_cli_roundtrip(tmp_path):
    """cli/export end-to-end: write artifact + --check round-trip on the
    synthetic body (resnet18 config to keep the CPU compile small)."""
    out_dir = str(tmp_path / "artifact")
    proc = run_cli([
        "-m", "shapy_tpu.cli.export", "--output-dir", out_dir,
        "--image-size", "64", "--platforms", "cpu", "--check",
        "--exp-opts", "network.smplx.backbone.type=resnet",
        "network.smplx.backbone.depth=18",
    ])
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "round-trip check" in proc.stdout
    meta = json.load(open(os.path.join(out_dir, "metadata.json")))
    assert meta["batch"] == "symbolic"
    assert "betas" in meta["outputs"]
    for name in ("model.jaxexport", "params.npz", "model_params.npz"):
        assert os.path.exists(os.path.join(out_dir, name))

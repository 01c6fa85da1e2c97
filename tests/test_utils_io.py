import os

import numpy as np
import jax.numpy as jnp
import pytest

from shapy_tpu.utils.config import (
    deep_merge,
    load_config,
    parse_args,
    parse_dotlist,
)
from shapy_tpu.utils.timer import Timer


def test_deep_merge():
    base = {"a": {"b": 1, "c": [1, 2]}, "d": 4}
    over = {"a": {"b": 2, "e": 5}, "f": 6}
    out = deep_merge(base, over)
    assert out == {"a": {"b": 2, "c": [1, 2], "e": 5}, "d": 4, "f": 6}
    # base untouched
    assert base["a"]["b"] == 1


def test_parse_dotlist():
    out = parse_dotlist(["a.b=1", "a.c=hello", "d=[1,2]", "e=1.5",
                         "f=True"])
    assert out == {
        "a": {"b": 1, "c": "hello"}, "d": [1, 2], "e": 1.5, "f": True
    }


def test_load_config_layering(tmp_path):
    y1 = tmp_path / "a.yaml"
    y1.write_text("network:\n  type: SMPLXRegressor\n  num_stages: 3\n")
    y2 = tmp_path / "b.yaml"
    y2.write_text("network:\n  num_stages: 2\n")
    cfg = load_config(
        {"network": {"type": "mlp", "lr": 1e-4}},
        [str(y1), str(y2)],
        ["network.lr=0.01"],
    )
    assert cfg["network"] == {
        "type": "SMPLXRegressor", "num_stages": 2, "lr": 0.01
    }


def test_parse_args(tmp_path):
    y = tmp_path / "c.yaml"
    y.write_text("x: 1\n")
    cfg = parse_args(
        ["--exp-cfg", str(y), "--exp-opts", "y.z=2"],
        defaults={"x": 0, "y": {"z": 0}},
    )
    assert cfg["x"] == 1 and cfg["y"]["z"] == 2


def test_timer():
    t = Timer("test")
    with t:
        sum(range(1000))
    assert t.mean > 0


def test_checkpointer_roundtrip(tmp_path):
    from shapy_tpu.io.checkpoint import Checkpointer, merge_loaded_params

    ck = Checkpointer(save_dir=str(tmp_path / "ckpts"))
    state = {
        "params": {"w": jnp.ones((3, 3)), "b": jnp.zeros(3)},
        "step": jnp.asarray(5),
    }
    path = ck.save(state, step=5)
    assert os.path.exists(os.path.join(str(tmp_path / "ckpts"),
                                       "latest_checkpoint"))
    loaded = ck.load(template=state)
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["w"]), np.ones((3, 3))
    )
    assert int(loaded["step"]) == 5

    # best pointer
    ck.save(state, step=6, is_best=True)
    loaded_best = ck.load(template=state, use_best=True)
    assert loaded_best is not None

    # non-strict merge keeps unmatched leaves
    partial = {"params": {"w": jnp.full((3, 3), 2.0), "b": jnp.zeros(3)},
               "step": jnp.asarray(9)}
    merged = merge_loaded_params(partial, loaded)
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["w"]), np.ones((3, 3))
    )


def test_checkpointer_empty_load(tmp_path):
    from shapy_tpu.io.checkpoint import Checkpointer

    ck = Checkpointer(save_dir=str(tmp_path / "none"))
    assert ck.load() is None


def test_full_model_checkpoint_import(tmp_path):
    """Round-trip the reference full-model checkpoint format through
    load_reference_model_checkpoint: backbone.* (OIHW), regressor.module.*
    head weights, regressor.mean_param."""
    import torch

    from shapy_tpu.io.model_import import load_reference_model_checkpoint
    from shapy_tpu.models.body import SMPLX, make_synthetic_model_data
    from shapy_tpu.models.heads import SMPLXRegressor

    reg = SMPLXRegressor(
        body_model_cfg={"smplx": {
            "global_rot": {"param_type": "cont_rot_repr"},
            "body_pose": {"param_type": "cont_rot_repr"},
        }},
        network_cfg={
            "num_stages": 2, "predict_hands": False,
            "predict_face": False,
            "backbone": {"type": "resnet", "depth": 18},
            "mlp": {"layers": [32], "dropout": 0.0},
        },
        body_model=SMPLX(model_data=make_synthetic_model_data(
            "smplx", subdivisions=1)),
    )

    # Build a torch-style checkpoint from the current params
    rng = np.random.default_rng(0)
    sd = {}
    for k, v in reg.params["backbone"].items():
        if k.endswith("running_var"):
            # variances must stay positive or BN rsqrt produces NaN
            arr = rng.uniform(0.5, 2.0,
                              size=np.asarray(v).shape).astype(np.float32)
        else:
            arr = rng.normal(size=np.asarray(v).shape).astype(np.float32)
        if k.endswith(".weight") and arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        sd[f"backbone.{k}"] = torch.tensor(arr)
    for k, v in reg.params["head"].items():
        sd[f"regressor.module.{k}"] = torch.tensor(
            rng.normal(size=np.asarray(v).shape).astype(np.float32))
    mean = rng.normal(size=(1, reg.param_dim)).astype(np.float32)
    sd["regressor.mean_param"] = torch.tensor(mean)
    sd["model.some_buffer"] = torch.tensor(np.zeros(3, np.float32))
    path = str(tmp_path / "ckpt.pt")
    torch.save({"model": sd, "iteration": 123}, path)

    new_params = load_reference_model_checkpoint(path, reg.params)
    np.testing.assert_allclose(
        np.asarray(new_params["param_mean"]), mean, atol=1e-6)
    # Conv weights transposed back correctly
    k = next(k for k in reg.params["backbone"]
             if k.endswith("conv1.weight"))
    np.testing.assert_allclose(
        np.asarray(new_params["backbone"][k]),
        np.asarray(sd[f"backbone.{k}"]).transpose(2, 3, 1, 0),
        atol=1e-6,
    )
    # Head weights taken verbatim
    hk = "output_layer.weight"
    np.testing.assert_allclose(
        np.asarray(new_params["head"][hk]),
        np.asarray(sd[f"regressor.module.{hk}"]), atol=1e-6)
    # The imported params still run
    out = reg.apply(new_params, jnp.zeros((1, 64, 64, 3)))
    assert np.isfinite(np.asarray(out["stage_01"]["betas"])).all()


def test_parse_dotlist_yaml_booleans_and_errors():
    """OmegaConf-style lowercase booleans/null must parse to real
    Python values ('false' as a string is TRUTHY — review finding), and
    traversing a scalar must raise a named error, not a TypeError."""
    import pytest

    from shapy_tpu.utils.config import parse_dotlist

    d = parse_dotlist(["a.use_x=false", "a.use_y=true", "a.z=null",
                       "a.keep=False"])
    assert d["a"]["use_x"] is False
    assert d["a"]["use_y"] is True
    assert d["a"]["z"] is None
    assert d["a"]["keep"] is False
    with pytest.raises(ValueError, match="not a config section"):
        parse_dotlist(["a=1", "a.b=2"])


def test_to_numpy_namedtuple_roundtrip():
    import collections

    from shapy_tpu.io.torch_import import _to_numpy

    Point = collections.namedtuple("Point", ["x", "y"])
    import torch

    p = Point(torch.ones(2), [torch.zeros(1)])
    out = _to_numpy(p)
    assert isinstance(out, Point)
    assert np.asarray(out.x).shape == (2,)


def test_get_logger_respects_late_file_sink(tmp_path):
    import logging as pylog

    from shapy_tpu.utils.logging import get_logger

    name = "shapy_tpu.test_late_sink"
    first = get_logger(name)  # console only
    log_file = str(tmp_path / "run.log")
    second = get_logger(name, log_file=log_file, level="DEBUG")
    assert second is first
    assert second.level == pylog.DEBUG
    assert any(isinstance(h, pylog.FileHandler)
               for h in second.handlers)
    second.debug("hello-sink")
    for h in second.handlers:
        h.flush()
    assert "hello-sink" in open(log_file).read()

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

"""Guard the driver interface (__graft_entry__, bench) against import or
signature regressions without paying their full compile cost."""

import importlib
import sys

import numpy as np
import jax.numpy as jnp


def test_graft_entry_importable_and_buildable():
    sys.path.insert(0, "/root/repo")
    mod = importlib.import_module("__graft_entry__")
    assert callable(mod.entry)
    assert callable(mod.dryrun_multichip)

    # The cheap configuration exercises the same builder the driver uses.
    reg = mod._build_flagship(subdivisions=1, mlp_layers=(32,),
                              backbone="resnet50")
    out = reg(jnp.zeros((1, 64, 64, 3)))
    assert "measurements" in out
    assert out["stage_02"]["betas"].shape == (1, 10)


def test_bench_module_importable():
    sys.path.insert(0, "/root/repo")
    mod = importlib.import_module("bench")
    assert callable(mod.main)
    assert mod.A100_REFERENCE_IMGS_PER_SEC > 0

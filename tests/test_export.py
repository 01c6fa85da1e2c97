"""Serving-artifact export: round-trip serialization, shape polymorphism,
weight swapping (shapy_tpu/io/export.py). The reference has no serving
subsystem (demo loop only, regressor/demo.py:122-355); these tests pin
the TPU-native export path's numerics instead of reference parity."""

import importlib
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def tiny_regressor():
    mod = importlib.import_module("__graft_entry__")
    return mod._build_flagship(subdivisions=1, mlp_layers=(32,),
                               backbone="resnet50")


def _images(batch, size=64, seed=0):
    rng = np.random.RandomState(seed)
    return rng.uniform(-1, 1, (batch, size, size, 3)).astype(np.float32)


def test_flatten_unflatten_roundtrip(tiny_regressor):
    import jax

    from shapy_tpu.io.export import flatten_params, unflatten_params

    flat = flatten_params(tiny_regressor.params)
    assert all(isinstance(k, str) for k in flat)
    tree = unflatten_params(flat)
    want_leaves = jax.tree_util.tree_leaves_with_path(tiny_regressor.params)
    got_leaves = jax.tree_util.tree_leaves_with_path(tree)
    assert len(want_leaves) == len(got_leaves)
    for (wp, wl), (gp, gl) in zip(sorted(want_leaves, key=lambda t: str(t[0])),
                                  sorted(got_leaves, key=lambda t: str(t[0]))):
        assert str(wp) == str(gp)
        np.testing.assert_array_equal(np.asarray(wl), np.asarray(gl))


def test_symbolic_batch_artifact_roundtrip(tiny_regressor, tmp_path):
    from shapy_tpu.io.export import (ServingModel, make_serving_fn,
                                     save_serving_artifact)

    art = str(tmp_path / "artifact")
    meta = save_serving_artifact(
        art, tiny_regressor, image_size=64, platforms=("cpu",),
    )
    assert meta["batch"] == "symbolic"

    served = ServingModel.load(art)
    fn = make_serving_fn(tiny_regressor)
    for batch in (1, 3):
        images = _images(batch)
        got = served.predict(images)
        want = fn(tiny_regressor.params, tiny_regressor.model.params, images)
        assert got["vertices"].shape[0] == batch
        assert set(got["measurements"]) == {"mass", "height", "chest",
                                            "waist", "hips"}
        import jax

        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5),
            got, want,
        )


def test_fixed_batch_artifact_rejects_other_batch(tiny_regressor, tmp_path):
    from shapy_tpu.io.export import ServingModel, save_serving_artifact

    art = str(tmp_path / "fixed")
    meta = save_serving_artifact(
        art, tiny_regressor, batch_size=2, image_size=64, platforms=("cpu",),
    )
    assert meta["batch"] == 2
    served = ServingModel.load(art)
    out = served.predict(_images(2))
    assert out["betas"].shape == (2, 10)
    with pytest.raises(ValueError, match="fixed batch"):
        served.predict(_images(3))
    with pytest.raises(ValueError, match="images must be"):
        served.predict(np.zeros((2, 32, 32, 3), np.float32))


def test_export_review_regressions(tiny_regressor, tmp_path):
    """Pins the round-4 review fixes: drop-only mesh refinement, named
    output metadata, explicit-output validation, float-frame rejection,
    and jit-cache retention across weight swaps."""
    import jax

    from shapy_tpu.io.export import (ServingModel, export_regressor,
                                     save_serving_artifact)
    from shapy_tpu.models.body.assets import icosphere, refine_to_counts

    # Drop-only refinement (no splits) must work, not crash.
    verts, faces = icosphere(2)
    v2, f2 = refine_to_counts(verts, faces, verts.shape[0],
                              faces.shape[0] - 10)
    assert v2.shape[0] == verts.shape[0]
    assert f2.shape[0] == faces.shape[0] - 10

    # Typo'd explicit outputs fail at export time, not serving time.
    with pytest.raises(KeyError, match="expresion"):
        export_regressor(tiny_regressor, batch_size=1, image_size=64,
                         platforms=("cpu",),
                         outputs=["betas", "expresion"])

    art = str(tmp_path / "meta")
    meta = save_serving_artifact(art, tiny_regressor, image_size=64,
                                 platforms=("cpu",))
    # Self-describing metadata: named output tree, not a flat tuple.
    assert "betas" in meta["outputs"]
    assert "mass" in meta["outputs"]["measurements"]

    served = ServingModel.load(art)
    served.predict(_images(1))
    jitted_before = served._jitted
    served.update_params(jax.tree.map(lambda a: a, served.params))
    served.predict(_images(1))
    assert served._jitted is jitted_before  # weight swap != recompile

    frames_art = str(tmp_path / "frames_meta")
    save_serving_artifact(frames_art, tiny_regressor, image_size=64,
                          platforms=("cpu",), from_full_images=True,
                          full_image_size=(96, 80))
    frames_served = ServingModel.load(frames_art)
    with pytest.raises(TypeError, match="uint8"):
        frames_served.predict(
            np.zeros((1, 96, 80, 3), np.float32),
            np.broadcast_to(np.eye(3, dtype=np.float32), (1, 3, 3)),
        )


def test_full_frame_ingest_artifact(tiny_regressor, tmp_path):
    """from_full_images export: uint8 frames + affines in, fused
    on-device crop/normalize, matches the live apply_from_full_images."""
    import jax

    from shapy_tpu.io.export import (ServingModel, make_serving_fn,
                                     save_serving_artifact)

    art = str(tmp_path / "frames")
    meta = save_serving_artifact(
        art, tiny_regressor, image_size=64, platforms=("cpu",),
        from_full_images=True, full_image_size=(96, 80),
    )
    assert meta["from_full_images"] and meta["full_image_size"] == [96, 80]

    served = ServingModel.load(art)
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, (3, 96, 80, 3)).astype(np.uint8)
    scale = np.diag([80 / 64, 96 / 64, 1.0]).astype(np.float32)
    affines = np.broadcast_to(scale, (3, 3, 3)).copy()

    got = served.predict(frames, affines)
    fn = make_serving_fn(tiny_regressor, from_full_images=True,
                         crop_size=64)
    want = fn(tiny_regressor.params, tiny_regressor.model.params,
              frames, affines)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5),
        got, want,
    )
    with pytest.raises(ValueError, match="require"):
        served.predict(frames)  # affines are mandatory for this mode


def test_sharded_export_matches_single_device(tiny_regressor):
    """Pod-serving export: the GSPMD batch-sharded artifact round-trips
    through serialize/deserialize and matches the unsharded path on the
    8-device virtual mesh."""
    import jax
    from jax import export as jex
    from jax.sharding import NamedSharding, PartitionSpec as P

    from shapy_tpu.io.export import export_regressor, make_serving_fn
    from shapy_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    assert mesh.size == 8

    exported, meta = export_regressor(
        tiny_regressor, batch_size=8, image_size=64, platforms=("cpu",),
        mesh=mesh,
    )
    assert meta["mesh"]["num_devices"] == 8
    restored = jex.deserialize(exported.serialize())

    images = _images(8)
    params = jax.device_put(tiny_regressor.params,
                            NamedSharding(mesh, P()))
    model_params = jax.device_put(tiny_regressor.model.params,
                                  NamedSharding(mesh, P()))
    sharded_images = jax.device_put(
        images, NamedSharding(mesh, P(mesh.axis_names[0])))

    got = restored.call(params, model_params, sharded_images)
    fn = make_serving_fn(tiny_regressor)
    want = fn(tiny_regressor.params, tiny_regressor.model.params, images)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5),
        got, want,
    )

    with pytest.raises(ValueError, match="divisible"):
        export_regressor(tiny_regressor, batch_size=9, image_size=64,
                         platforms=("cpu",), mesh=mesh)
    with pytest.raises(ValueError, match="fixed batch_size"):
        export_regressor(tiny_regressor, image_size=64,
                         platforms=("cpu",), mesh=mesh)


def test_sharded_full_frame_export(tiny_regressor):
    """The pod-sharded and fused-ingest modes compose: uint8 frames +
    affines, both batch-sharded over the data axis."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from shapy_tpu.io.export import export_regressor, make_serving_fn
    from shapy_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    exported, meta = export_regressor(
        tiny_regressor, batch_size=8, image_size=64, platforms=("cpu",),
        mesh=mesh, from_full_images=True, full_image_size=(96, 80),
    )
    assert meta["from_full_images"] and meta["mesh"]["num_devices"] == 8

    rng = np.random.RandomState(2)
    frames = rng.randint(0, 256, (8, 96, 80, 3)).astype(np.uint8)
    scale = np.diag([80 / 64, 96 / 64, 1.0]).astype(np.float32)
    affines = np.broadcast_to(scale, (8, 3, 3)).copy()

    rep = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data"))
    got = exported.call(
        jax.device_put(tiny_regressor.params, rep),
        jax.device_put(tiny_regressor.model.params, rep),
        jax.device_put(frames, bsh),
        jax.device_put(affines, bsh),
    )
    fn = make_serving_fn(tiny_regressor, from_full_images=True,
                         crop_size=64)
    want = fn(tiny_regressor.params, tiny_regressor.model.params,
              frames, affines)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5),
        got, want,
    )


def test_weight_swap_without_reexport(tiny_regressor, tmp_path):
    import jax

    from shapy_tpu.io.export import ServingModel, save_serving_artifact

    art = str(tmp_path / "swap")
    save_serving_artifact(art, tiny_regressor, image_size=64,
                          platforms=("cpu",))
    served = ServingModel.load(art)
    images = _images(2, seed=1)
    base = np.asarray(served.predict(images)["betas"])

    bumped = jax.tree.map(lambda a: a, served.params)
    bumped["param_mean"] = bumped["param_mean"] + 0.25
    served.update_params(bumped)
    swapped = np.asarray(served.predict(images)["betas"])
    assert np.max(np.abs(swapped - base)) > 1e-3

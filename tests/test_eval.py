import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from shapy_tpu.eval.metrics import (
    PointError,
    SparsePointRegressor,
    build_alignment,
    point_error,
    procrustes_align,
    scale_align,
    translation_align,
)
from shapy_tpu.eval.evaluator import Evaluator, bmi_bucket


def random_cloud(rng, B=2, P=50):
    return rng.normal(size=(B, P, 3)).astype(np.float32)


def test_translation_alignment(rng):
    x = random_cloud(rng)
    shift = np.asarray([[1.0, -2.0, 3.0]])
    est, gt = translation_align(
        jnp.asarray(x + shift[None]), jnp.asarray(x)
    )
    np.testing.assert_allclose(
        np.asarray(point_error(est, gt)), 0.0, atol=1e-5
    )


def test_scale_alignment(rng):
    x = random_cloud(rng)
    est, gt = scale_align(jnp.asarray(x * 2.5 + 1.0), jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(point_error(est, gt)), 0.0, atol=1e-5
    )


def test_procrustes_alignment(rng):
    x = random_cloud(rng, B=3)
    R = Rotation.random(3, random_state=0).as_matrix()
    transformed = np.einsum("bij,bpj->bpi", R, x) * 1.7 + np.asarray(
        [0.3, -0.1, 2.0]
    )
    est, gt = procrustes_align(
        jnp.asarray(transformed, jnp.float32), jnp.asarray(x)
    )
    assert float(np.asarray(point_error(est, gt)).max()) < 1e-3


def test_procrustes_handles_reflection(rng):
    x = random_cloud(rng, B=1)
    mirrored = x * np.asarray([-1.0, 1.0, 1.0])
    est, gt = procrustes_align(jnp.asarray(mirrored), jnp.asarray(x))
    # Proper rotation only: a mirror cannot be fully recovered
    err = float(np.asarray(point_error(est, gt)).mean())
    assert err > 1e-3


def test_point_error_class(rng):
    x = random_cloud(rng)
    pe = PointError("root", root=(0, 1))
    err = pe(jnp.asarray(x + 5.0), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(err), 0.0, atol=1e-5)


def test_sparse_point_regressor_matches_scipy(rng):
    import scipy.sparse as sp

    V, P = 40, 100
    dense = np.zeros((P, V))
    for i in range(P):
        cols = rng.choice(V, size=3, replace=False)
        w = rng.uniform(size=3)
        dense[i, cols] = w / w.sum()
    mat = sp.csr_matrix(dense)
    reg = SparsePointRegressor.from_scipy(mat)
    verts = random_cloud(rng, B=2, P=V)
    ours = np.asarray(reg.regress(jnp.asarray(verts)))
    ref = np.einsum("pv,bvk->bpk", dense, verts)
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    # p2p with translation alignment removes constant offsets
    err = reg(jnp.asarray(verts + 1.23), jnp.asarray(verts))
    np.testing.assert_allclose(np.asarray(err), 0.0, atol=1e-5)


def test_bmi_buckets():
    assert bmi_bucket(1.80, 55.0) == "underweight"
    assert bmi_bucket(1.70, 65.0) == "normal"
    assert bmi_bucket(1.70, 80.0) == "overweight"
    assert bmi_bucket(1.60, 90.0) == "obese"


def test_evaluator_run(rng):
    V = 30
    gt_v = random_cloud(rng, B=4, P=V)
    est_v = gt_v + rng.normal(size=gt_v.shape).astype(np.float32) * 0.01

    ev = Evaluator()
    outputs = {
        "stage_02": {
            "v_shaped": jnp.asarray(est_v),
            "measurements": {
                "height": jnp.asarray([1.7, 1.8, 1.6, 1.75]),
                "chest": jnp.asarray([1.0, 1.1, 0.9, 1.0]),
                "waist": jnp.asarray([0.8, 0.9, 0.7, 0.8]),
                "hips": jnp.asarray([1.0, 1.0, 1.0, 1.0]),
                "mass": jnp.asarray([70.0, 80.0, 60.0, 75.0]),
            },
        }
    }
    targets = {
        "gt_v_shaped": jnp.asarray(gt_v),
        "height": jnp.asarray([1.72, 1.78, 1.61, 1.74]),
        "mass": jnp.asarray([71.0, 79.0, 62.0, 74.0]),
    }

    def model_fn(images, batch):
        return outputs

    loader = [
        {
            "images": jnp.zeros((4, 8, 8, 3)),
            "targets": targets,
            "genders": ["male", "female", "male", "neutral"],
        }
    ]
    results = ev.run(model_fn, {"hbw": loader})
    r = results["hbw"]
    assert r["v2v_t"] < 0.05
    assert r["height_error"] == pytest.approx(
        np.mean([0.02, 0.02, 0.01, 0.01]), abs=1e-6
    )
    assert "v2v_t/male" in r and "v2v_t/female" in r


def test_image_summaries(rng):
    from shapy_tpu.models.body.assets import icosphere

    verts, faces = icosphere(1)
    ev = Evaluator()
    images = rng.uniform(-2, 2, size=(3, 64, 64, 3)).astype(np.float32)
    outputs = {
        "stage_02": {
            "vertices": np.broadcast_to(
                verts[None], (3,) + verts.shape
            ).astype(np.float32),
            "faces": faces,
        }
    }
    grid = ev.create_image_summaries(images, outputs, "test", max_images=2)
    assert grid.shape == (64, 128, 3)
    assert np.isfinite(grid).all()
    # the mesh overlay actually changed pixels vs the background
    bg = np.clip(
        images[0] * np.asarray([0.229, 0.224, 0.225])
        + np.asarray([0.485, 0.456, 0.406]), 0, 1
    )
    assert np.abs(grid[:, :64] - bg).max() > 0.1


def test_point_fscore_matches_bruteforce():
    """point_fscore == brute-force nearest-neighbour computation
    (reference metrics.py:306-330 semantics, incl. the swapped
    precision/recall naming)."""
    from shapy_tpu.eval import point_fscore

    rng = np.random.default_rng(7)
    pred = rng.normal(size=(700, 3)).astype(np.float32)
    gt = (rng.normal(size=(900, 3)) * 1.1).astype(np.float32)

    d = np.linalg.norm(pred[:, None] - gt[None], axis=-1)
    pred_to_gt = d.min(axis=1)
    gt_to_pred = d.min(axis=0)
    thresh = 0.5
    recall = (pred_to_gt < thresh).mean()
    precision = (gt_to_pred < thresh).mean()
    fscore = 2 * recall * precision / (recall + precision)

    out = point_fscore(pred, gt, thresh)
    assert abs(float(out["recall"]) - recall) < 1e-6
    assert abs(float(out["precision"]) - precision) < 1e-6
    assert abs(float(out["fscore"]) - fscore) < 1e-6


def test_point_fscore_identical_clouds():
    from shapy_tpu.eval import point_fscore

    pts = np.random.default_rng(1).normal(size=(300, 3)).astype(np.float32)
    out = point_fscore(pts, pts, 1e-4)
    assert float(out["fscore"]) == 1.0

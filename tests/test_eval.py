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


def test_bmi_hist_group_matches_reference_digitize():
    """bmi_hist_group == np.digitize(bmi, [20,25,30,35,40])
    (reference evaluation.py:671,729) with -1 for missing height."""
    from shapy_tpu.eval.evaluator import BMI_HIST_BINS, bmi_hist_group

    heights = np.asarray([1.80, 1.70, 1.60, 1.75, 1.65, 0.0])
    masses = np.asarray([55.0, 65.0, 80.0, 100.0, 120.0, 70.0])
    groups = bmi_hist_group(heights, masses)
    bmi = masses[:5] / heights[:5] ** 2
    np.testing.assert_array_equal(
        groups[:5], np.digitize(bmi, np.asarray(BMI_HIST_BINS))
    )
    assert groups[5] == -1


class _StubWriter:
    def __init__(self):
        self.scalars = {}
        self.figures = {}
        self.images = {}

    def add_scalar(self, tag, value, step):
        self.scalars[tag] = value

    def add_figure(self, tag, fig, step):
        self.figures[tag] = fig

    def add_image(self, tag, img, step):
        self.images[tag] = img

    def flush(self):
        pass


def test_evaluator_bmi_histograms(rng):
    """Per-metric BMI-group figures: streaming (sum,count) means match a
    direct per-group computation (reference evaluation.py:735-751)."""
    gt_v = random_cloud(rng, B=4, P=20)
    est_v = gt_v + 0.01 * rng.normal(size=gt_v.shape).astype(np.float32)
    writer = _StubWriter()
    ev = Evaluator(summary_writer=writer, render_summaries=False)

    def model_fn(images, batch):
        return {"stage_02": {"v_shaped": jnp.asarray(est_v)}}

    loader = [{
        "images": jnp.zeros((4, 4, 4, 3)),
        "targets": {"gt_v_shaped": jnp.asarray(gt_v)},
        "bmi_hist_groups": np.asarray([0, 0, 3, -1]),
    }]
    ev.run(model_fn, {"hbw": loader})
    # tags carry the dataset prefix so multi-dataset runs don't clobber
    assert "hbw/bmi histogram v2v_t" in writer.figures

    # recompute expected group means from the metric values directly
    m = ev.compute_batch_metrics(
        {"stage_02": {"v_shaped": jnp.asarray(est_v)}},
        {"gt_v_shaped": jnp.asarray(gt_v)},
    )
    vals = np.asarray(m["v2v_t"])
    fig = writer.figures["hbw/bmi histogram v2v_t"]
    heights = [p.get_height() for p in fig.axes[0].patches]
    assert heights[0] == pytest.approx(vals[:2].mean() * 1000, rel=1e-5)
    assert heights[3] == pytest.approx(vals[2] * 1000, rel=1e-5)
    assert heights[1] == 0.0 and heights[5] == 0.0


def test_evaluator_bmi_histograms_skip_nan(rng):
    """NaN metric entries (invalid samples) must stay out of the bucket
    sums AND counts — a NaN would otherwise poison the bucket mean."""
    V = 50
    verts = random_cloud(rng, B=3, P=V)
    j14 = rng.uniform(size=(14, V)).astype(np.float32)
    j14 /= j14.sum(1, keepdims=True)
    gt14 = np.einsum("jv,bvn->bjn", j14, verts)
    writer = _StubWriter()
    ev = Evaluator(summary_writer=writer, render_summaries=False,
                   j14_regressor=j14)

    def model_fn(images, batch):
        return {"stage_02": {"vertices": jnp.asarray(verts)}}

    loader = [{
        "images": jnp.zeros((3, 4, 4, 3)),
        "targets": {
            "gt_joints14": jnp.asarray(gt14),
            # sample 1 invalid -> NaN metric; it shares bucket 0 with
            # the valid sample 0
            "joints14_valid": jnp.asarray([1.0, 0.0, 1.0]),
        },
        "bmi_hist_groups": np.asarray([0, 0, 2]),
    }]
    results = ev.run(model_fn, {"hbw": loader})
    fig = writer.figures["hbw/bmi histogram mpjpe14_root"]
    heights = [p.get_height() for p in fig.axes[0].patches]
    assert np.isfinite(heights).all()
    # perfect reconstruction -> bucket means ~0, not NaN
    assert heights[0] == pytest.approx(0.0, abs=1e-2)
    assert np.isfinite(results["hbw"]["mpjpe14_root"])


def test_metric_accumulator_skips_nan():
    from shapy_tpu.eval.evaluator import MetricAccumulator

    acc = MetricAccumulator()
    acc.update(np.asarray([1.0, np.nan, 3.0]), ["a", "a", "b"])
    assert acc.mean == pytest.approx(2.0)
    assert acc.group_means() == {"a": 1.0, "b": 3.0}

    # all-invalid is NaN, not a perfect-looking 0.0
    empty = MetricAccumulator()
    empty.update(np.asarray([np.nan, np.nan]))
    assert np.isnan(empty.mean)
    assert empty.group_means() == {}


def test_mpjpe14_respects_validity_mask(rng):
    V = 50
    verts = random_cloud(rng, B=2, P=V)
    j14 = rng.uniform(size=(14, V)).astype(np.float32)
    j14 /= j14.sum(1, keepdims=True)
    gt14 = np.einsum("jv,bvn->bjn", j14, verts)
    ev = Evaluator(j14_regressor=j14)
    metrics = ev.compute_batch_metrics(
        {"stage_02": {"vertices": jnp.asarray(verts)}},
        {
            "gt_joints14": jnp.asarray(gt14),
            "joints14_valid": jnp.asarray([1.0, 0.0]),
        },
    )
    vals = np.asarray(metrics["mpjpe14_root"])
    assert np.isfinite(vals[0]) and vals[0] < 1e-5
    assert np.isnan(vals[1])


def test_image_summaries_predicted_camera(rng):
    """Overlays use the regressed weak-persp camera when present: a
    translation shift in camera x moves the rendered mask right
    (reference evaluation.py:506-533 renders with the predicted
    scale/translation)."""
    from shapy_tpu.models.body.assets import icosphere

    verts, faces = icosphere(2)
    images = np.zeros((1, 64, 64, 3), np.float32)

    def render(tx, scale_first=False):
        scale = np.asarray([[0.8]], np.float32)
        transl = np.asarray([[tx, 0.0]], np.float32)
        if scale_first:
            transl = transl * scale  # same camera, scale_first encoding
        outputs = {
            "stage_02": {
                "vertices": verts[None].astype(np.float32) * 0.5,
                "faces": faces,
            },
            "camera_parameters": {
                "scale": scale,
                "translation": transl,
                "scale_first": scale_first,
            },
        }
        ev = Evaluator()
        return ev.create_image_summaries(
            images, outputs, "t", max_images=1,
            mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0))

    centered = render(0.0)
    shifted = render(0.4)
    assert centered is not None and shifted is not None
    mask_c = centered.sum(-1) > 1e-4
    mask_s = shifted.sum(-1) > 1e-4
    assert mask_c.any() and mask_s.any()
    cx_c = np.nonzero(mask_c)[1].mean()
    cx_s = np.nonzero(mask_s)[1].mean()
    assert cx_s > cx_c + 3  # moved right

    # scale_first encoding of the SAME camera renders identically
    sf = render(0.4, scale_first=True)
    np.testing.assert_allclose(sf, shifted, atol=1e-6)


def test_build_evaluator_config_driven_alignments(rng):
    """Reference Metrics config (config/defaults.py:19-48): v2v/v2v_t
    alignment tuples, mpjpe alignments + NAMED root joints resolved
    against the model keypoint order (evaluation.py:570-637)."""
    from shapy_tpu.eval.evaluator import build_evaluator

    names = ["pelvis", "left_hip", "right_hip", "spine1", "head"]
    ev = build_evaluator(
        {
            "evaluation": {"body": {
                "v2v": ("procrustes", "scale", "translation"),
                "v2v_t": ("scale", "translation"),
                "mpjpe": {"alignments": ("root", "procrustes"),
                          "root_joints": ("left_hip", "right_hip")},
            }},
        },
        keypoint_names=names,
    )
    assert set(ev.v2v_alignments) == {"procrustes", "scale",
                                      "translation"}
    assert set(ev.v2v_t_alignments) == {"scale", "translation"}
    assert set(ev.alignments) == {"root", "procrustes"}
    assert set(ev.mpjpe14_alignments) == {"root", "procrustes"}

    # root alignment actually uses joints 1, 2: shifting est by a
    # constant and the configured roots to match gt => zero error
    B, J = 2, 5
    gt = rng.normal(size=(B, J, 3)).astype(np.float32)
    est = gt + 7.0
    err = ev.alignments["root"](jnp.asarray(est), jnp.asarray(gt))
    np.testing.assert_allclose(np.asarray(err), 0.0, atol=1e-5)

    # v2v emits one metric per configured alignment
    outputs = {"stage_02": {"vertices": jnp.asarray(est)}}
    targets = {"gt_vertices": jnp.asarray(gt)}
    m = ev.compute_batch_metrics(outputs, targets)
    assert {"v2v", "v2v_scale", "v2v_procrustes"} <= set(m)

"""Real released-model predictions as fixtures.

``/root/reference/regressor/hbw_evaluation/example_shapy_prediction*.npz``
ship 3 SMPL-X (10475x3) and 3 SMPL (6890x3) bodies predicted by the
RELEASED SHAPY model on HBW test images (reference
``hbw_evaluation/README_HBW_EVAL.md``), plus the official 1631-entry
test image-name list.  They are the only released-model outputs in the
environment, so use them to

- validate our submission checker against the reference's own example
  artifacts (``cli/evaluate_hbw.check_submission_format``, behavioural
  spec ``hbw_evaluation/test_submission_format.py:4-43``), and
- run the production measurement pipeline on REAL regressed SMPL-X
  bodies (the ``img_00.npz`` golden is a single optimisation fit, not a
  network output), asserting plausible-human measurements and
  support-hull-vs-exact-hull agreement on real regressed geometry.
"""

import os

import numpy as np
import pytest

HBW_DIR = "/root/reference/regressor/hbw_evaluation"
SMPLX_NPZ = os.path.join(HBW_DIR, "example_shapy_prediction.npz")
SMPL_NPZ = os.path.join(HBW_DIR, "example_shapy_prediction_smpl.npz")
NAMES_NPY = os.path.join(HBW_DIR, "hbw_testset_image_names.npy")
FACES_FIXTURE = (
    "/root/reference/samples/shapy_fit_for_virtual_measurements/img_00.npz"
)

pytestmark = pytest.mark.skipif(
    not (os.path.exists(SMPLX_NPZ) and os.path.exists(SMPL_NPZ)),
    reason="reference hbw_evaluation fixtures not present",
)


def test_checker_accepts_reference_example_submissions(capsys):
    from shapy_tpu.cli.evaluate_hbw import check_submission_format

    assert check_submission_format(SMPLX_NPZ, model_type="smplx")
    assert check_submission_format(SMPL_NPZ, model_type="smpl")
    # Wrong topology for the claimed model type must be rejected.
    assert not check_submission_format(SMPLX_NPZ, model_type="smpl")
    assert not check_submission_format(SMPL_NPZ, model_type="smplx")
    capsys.readouterr()


def test_example_image_names_follow_hbw_layout():
    """The official test list has 1631 unique `split/subject/source/frame`
    paths; the example predictions use the same layout (they are VAL-split
    images — the reference ships them as format examples, not as a valid
    test submission, which `test_submission_format.py`'s isin check would
    reject just like ours does with the names list supplied)."""
    import re

    official = [str(x) for x in np.load(NAMES_NPY, allow_pickle=True)]
    assert len(official) == 1631 and len(set(official)) == 1631
    pat = re.compile(
        r"^(test|val)/\d+_[A-Za-z0-9]+_[A-Za-z0-9]+/"
        r"(Photos_Lab|Pictures_in_the_Wild)/\d+\.png$"
    )
    for path in (SMPLX_NPZ, SMPL_NPZ):
        names = np.load(path, allow_pickle=True)["image_name"]
        assert all(pat.match(str(n)) for n in names), path
    assert all(pat.match(n) for n in official[:50])

    from shapy_tpu.cli.evaluate_hbw import check_submission_format

    # With the official names list supplied, a 3-row val-split example is
    # NOT a valid test submission — the checker must say so.
    assert not check_submission_format(
        SMPLX_NPZ, image_names_path=NAMES_NPY, model_type="smplx"
    )


@pytest.mark.skipif(
    not os.path.exists(FACES_FIXTURE),
    reason="SMPL-X faces fixture not present",
)
def test_real_regressed_smplx_bodies_measure_plausibly():
    """Full measurement pipeline on the released model's real predictions:
    outputs must be plausible humans and the on-device support-function
    hull must agree with the exact scipy hull on real (not synthetic)
    regressed geometry."""
    import jax.numpy as jnp

    from shapy_tpu.measure.measurements import BodyMeasurements

    v_shaped = np.load(SMPLX_NPZ, allow_pickle=True)["v_shaped"].astype(
        np.float32
    )
    faces = np.load(FACES_FIXTURE, allow_pickle=True)["faces"].astype(
        np.int64
    )
    meas = BodyMeasurements(model_type="smplx")
    out = meas.forward_from_vertices(jnp.asarray(v_shaped), faces)[
        "measurements"
    ]
    got = {k: np.asarray(v["tensor"]) for k, v in out.items()}

    assert np.all((got["height"] > 1.3) & (got["height"] < 2.1)), got
    assert np.all((got["mass"] > 35.0) & (got["mass"] < 150.0)), got
    for name in ("chest", "waist", "hips"):
        assert np.all((got[name] > 0.5) & (got[name] < 1.6)), (name, got)
    # Waist below chest and hips for every subject would over-assume body
    # shape; but chest must exceed waist OR hips for a plausible human.
    assert np.all(np.maximum(got["chest"], got["hips"]) > got["waist"])

    # Support-function hull vs exact scipy hull on the same slice points:
    # the synthetic-slice claim is <0.006 mm; allow 0.1 mm on real bodies.
    tris = v_shaped[:, faces]
    for name in ("chest", "waist", "hips"):
        exact = meas.periphery_exact_np(tris, name)
        diff_mm = 1000.0 * np.abs(got[name] - exact)
        assert np.all(diff_mm < 0.1), (name, diff_mm)

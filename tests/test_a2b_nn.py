import numpy as np
import pytest

from shapy_tpu.models.attributes.a2b import A2B
from shapy_tpu.models.attributes.regression_data import RegressionDataset
from shapy_tpu.measure import BodyMeasurements, MeasurementAnchors
from shapy_tpu.models.body import SMPLX, make_synthetic_model_data


def _cfg(net):
    return {
        "type": "a2b",
        "ds_gender": "female",
        "model_gender": "neutral",
        "model_type": "smplx",
        "num_shape_comps": 10,
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
        "measurements": {"height_gt": True, "weight_gt": True},
        "network": net,
    }


def test_a2b_nn_training_with_v2v():
    body = SMPLX(model_data=make_synthetic_model_data(
        "smplx", subdivisions=1))
    anchors = MeasurementAnchors.synthetic(
        body.faces, np.asarray(body.params["v_template"]))
    meas = BodyMeasurements(anchors=anchors, num_hull_directions=64)
    ds = RegressionDataset.synthetic(n_train=200, n_eval=32)

    a2b = A2B(
        _cfg({"type": "mlp",
              "mlp": {"hidden_dims": (64,), "num_steps": 10}}),
        body_model=body,
        meas_module=meas,
    )
    report = a2b.fit_nn(
        ds.db, v2v_weight=1.0, betas_weight=0.1, edge_weight=0.1,
        meas_weights={"height": 0.1}, num_steps=60, batch_size=64,
    )
    assert np.isfinite(report["val"]["betas_l1"])
    assert report["val"]["v2v_mm"] > 0
    # trained NN should beat an untrained one on betas L1
    fresh = A2B(
        _cfg({"type": "mlp",
              "mlp": {"hidden_dims": (64,), "num_steps": 10}}),
        body_model=body,
    )
    (xv, yv) = (
        fresh.create_input_feature_vec(ds.db["val"]),
        np.asarray(ds.db["val"]["betas_smplx_neutral"])[:, :10],
    )
    untrained = fresh.validate(yv, fresh.a2b.predict(xv))
    assert report["val"]["betas_l1"] < untrained["betas_l1"]


def test_a2b_nn_requires_nn_type():
    a2b = A2B(_cfg({"type": "polynomial", "polynomial": {"degree": 2}}))
    with pytest.raises(AssertionError):
        a2b.fit_nn({"train": {}, "val": {}, "test": {}})

"""Parity vs the only real-mesh measurement golden in the environment.

``/root/reference/samples/shapy_fit_for_virtual_measurements/img_00.npz``
ships a real SMPL-X mesh (v_shaped 10475x3, faces 20908x3) together with the
reference pipeline's actual recorded measurement outputs (produced by the
CUDA mesh-mesh-intersection kernel + scipy hulls,
``body_measurements.py:130-179``): mass 56.8689 kg, height 1.6437 m, chest
0.87454 m, waist 0.76515 m, hips 0.95468 m.

These tests run the repo's production measurement path
(:class:`shapy_tpu.measure.measurements.BodyMeasurements`, both the AoS
``forward`` and the SoA ``forward_from_vertices`` hot path) on that mesh and
assert <1 mm / exact parity.  Root cause of the round-2 1.76 mm hips gap and
the reference's slice-drop semantics are documented in
``shapy_tpu/ops/plane_slice.py:plane_slice_reference_soa`` and emulated
bit-faithfully in ``tools/reference_slice_emulator.py``.
"""

import io
import os

import numpy as np
import pytest

FIXTURE = "/root/reference/samples/shapy_fit_for_virtual_measurements/img_00.npz"

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="reference sample fixture not present"
)


@pytest.fixture(scope="module")
def golden():
    """Load the fixture; the 'measurements' entry is a CUDA-pickled dict."""
    import torch

    orig = torch.storage._load_from_bytes
    torch.storage._load_from_bytes = lambda b: torch.load(
        io.BytesIO(b), map_location="cpu", weights_only=False
    )
    try:
        d = np.load(FIXTURE, allow_pickle=True)
        meas = {k: float(v[0]) for k, v in d["measurements"].item().items()}
        out = {
            "v_shaped": d["v_shaped"].astype(np.float32),
            "faces": d["faces"].astype(np.int64),
            "measurements": meas,
        }
    finally:
        torch.storage._load_from_bytes = orig
    return out


@pytest.fixture(scope="module")
def meas_module():
    from shapy_tpu.measure.measurements import BodyMeasurements

    return BodyMeasurements(model_type="smplx")


def _assert_parity(result, golden_meas):
    # mass (kg) and height (m): same closed-form math as the reference,
    # only f32 rounding between us and the recorded values.
    assert abs(result["mass"] - golden_meas["mass"]) < 1e-3, result
    assert abs(result["height"] - golden_meas["height"]) < 1e-5, result
    # circumferences: <1 mm parity budget (BASELINE.md); with the
    # reference-semantics slice the observed gaps are <0.02 mm.
    for name in ("chest", "waist", "hips"):
        diff_mm = 1000.0 * abs(result[name] - golden_meas[name])
        assert diff_mm < 1.0, f"{name}: {diff_mm:.3f} mm off golden"


def test_forward_aos_matches_reference_golden(golden, meas_module):
    import jax.numpy as jnp

    tris = jnp.asarray(golden["v_shaped"][golden["faces"]])[None]
    out = meas_module.forward(tris)["measurements"]
    result = {k: float(np.asarray(v["tensor"])[0]) for k, v in out.items()}
    _assert_parity(result, golden["measurements"])


def test_forward_from_vertices_soa_matches_reference_golden(golden, meas_module):
    import jax.numpy as jnp

    verts = jnp.asarray(golden["v_shaped"])[None]
    out = meas_module.forward_from_vertices(verts, golden["faces"])[
        "measurements"
    ]
    result = {k: float(np.asarray(v["tensor"])[0]) for k, v in out.items()}
    _assert_parity(result, golden["measurements"])


def test_emulator_matches_golden_exactly(golden):
    """The bit-faithful numpy emulation of the CUDA kernel pins the root
    cause: its point set reproduces the recorded circumferences to
    <0.001 mm, so any residual repo-side gap is repo-side, not an
    unexplained reference quirk."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.reference_slice_emulator import reference_circumference
    from shapy_tpu.measure.measurements import MeasurementAnchors

    tris = golden["v_shaped"][golden["faces"]]
    anchors = MeasurementAnchors.from_yaml(model_type="smplx")
    for name in ("chest", "waist", "hips"):
        a = getattr(anchors, name)
        tri = tris[a.face_idx]
        h = float((tri * np.asarray(a.bary, np.float32)[:, None]).sum(0)[1])
        value, _ = reference_circumference(tris, h)
        diff_mm = 1000.0 * abs(value - golden["measurements"][name])
        assert diff_mm < 0.01, f"{name}: emulator {diff_mm:.4f} mm off"


def test_exact_slice_mode_documented_deviation(golden):
    """The mathematically-exact full-segment slice measures the hips
    ~1.76 mm LARGER than the reference on this mesh (the reference drops
    roughly half of the crossing points — one first-hit point per
    colliding pair instead of two segment endpoints, plus face id 0).
    Pin the deviation so the documented number stays honest."""
    import jax.numpy as jnp
    from shapy_tpu.measure.measurements import BodyMeasurements

    meas = BodyMeasurements(model_type="smplx", slice_mode="exact")
    tris = jnp.asarray(golden["v_shaped"][golden["faces"]])[None]
    out = meas.forward(tris)["measurements"]
    hips_mm = 1000.0 * (
        float(np.asarray(out["hips"]["tensor"])[0])
        - golden["measurements"]["hips"]
    )
    assert 1.0 < hips_mm < 2.5, f"exact-mode hips deviation now {hips_mm:.3f} mm"
    # chest/waist stay inside the budget even in exact mode on this mesh.
    for name in ("chest", "waist"):
        diff_mm = 1000.0 * abs(
            float(np.asarray(out[name]["tensor"])[0])
            - golden["measurements"][name]
        )
        assert diff_mm < 1.0

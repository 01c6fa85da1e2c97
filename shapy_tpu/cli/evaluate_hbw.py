"""Offline HBW-test evaluation from a submission npz.

Behavioural spec: reference ``regressor/hbw_evaluation/
evaluate_hbw.py:61-187``: load {image_name (N,), v_shaped (N, V, 3)},
compare against per-subject GT v_shaped npy files; print V2V (SMPL-X
only), P2P-20k, and height/chest/waist/hips (mm) + mass (kg) errors with
the reference's exact print format.

TPU-first: everything (v2v, sparse-point regression, measurements) is one
batched jitted computation over the whole submission instead of a
per-image GPU/CPU loop.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict, Optional

import numpy as np


def evaluate_submission(
    labels,
    fits: np.ndarray,
    gt_lookup,
    model_type: str = "smplx",
    point_regressor_gt=None,
    point_regressor_fit=None,
    measurements_gt=None,
    measurements_fit=None,
    gt_faces: Optional[np.ndarray] = None,
    fit_faces: Optional[np.ndarray] = None,
    batch_size: int = 16,
) -> Dict[str, float]:
    """Core metric computation; gt_lookup maps a label to GT v_shaped."""
    import jax
    import jax.numpy as jnp

    from shapy_tpu.eval.metrics import point_error, translation_align

    @jax.jit
    def batch_metrics(fit_v, gt_v):
        out = {}
        if model_type == "smplx":
            a, b = translation_align(fit_v, gt_v)
            out["v2v_t"] = jnp.mean(point_error(a, b), axis=-1)
        if point_regressor_gt is not None:
            p_gt = point_regressor_gt.regress(gt_v)
            p_fit = point_regressor_fit.regress(fit_v)
            a, b = translation_align(p_fit, p_gt)
            out["p2p_t"] = jnp.mean(point_error(a, b), axis=-1)
        if measurements_gt is not None:
            m_gt = measurements_gt.forward(
                gt_v[:, gt_faces])["measurements"]
            m_fit = measurements_fit.forward(
                fit_v[:, fit_faces])["measurements"]
            for k in ("height", "chest", "waist", "hips", "mass"):
                out[f"{k}_error"] = jnp.abs(
                    m_gt[k]["tensor"] - m_fit[k]["tensor"]
                )
        return out

    accum: Dict[str, list] = {}
    for start in range(0, len(fits), batch_size):
        sl = slice(start, min(start + batch_size, len(fits)))
        gt = np.stack([gt_lookup(l) for l in labels[sl]])
        batch = batch_metrics(
            jnp.asarray(fits[sl], jnp.float32),
            jnp.asarray(gt, jnp.float32),
        )
        for k, v in batch.items():
            accum.setdefault(k, []).append(np.asarray(v))
    return {k: float(np.concatenate(v).mean()) for k, v in accum.items()}


def main(
    input_npz_file: str,
    hbw_folder: str,
    model_type: str = "smplx",
    point_reg_gt: str = "",
    point_reg_fit: str = "",
    body_measurement_folder: str = "",
    body_model_folder: str = "",
    faces_path: str = "",
) -> int:
    """faces_path: optional npz with a 'faces' array — supplies the mesh
    topology directly (e.g. from a previous demo/fit output) instead of
    loading a licensed body model, for asset-free offline scoring of
    same-topology submissions."""
    from shapy_tpu.eval.metrics import SparsePointRegressor
    from shapy_tpu.measure import BodyMeasurements, MeasurementAnchors
    from shapy_tpu.models.body import SMPLX, make_synthetic_model_data

    submission = np.load(input_npz_file)
    labels = [str(x) for x in submission["image_name"]]
    fits = np.asarray(submission["v_shaped"], np.float32)

    preg_gt = preg_fit = None
    if point_reg_gt and os.path.exists(point_reg_gt):
        preg_gt = SparsePointRegressor.from_pickle(point_reg_gt)
        preg_fit = (
            SparsePointRegressor.from_pickle(point_reg_fit)
            if point_reg_fit and point_reg_fit != point_reg_gt
            else preg_gt
        )

    synthetic = os.environ.get("SHAPY_TPU_SYNTHETIC_BODY", "0") == "1"
    if faces_path:
        faces = np.asarray(
            np.load(os.path.expandvars(faces_path), allow_pickle=True)
            ["faces"], np.int64)
        meas = BodyMeasurements(
            model_type="smplx",
            meas_definition_path=os.path.join(
                body_measurement_folder, "measurement_defitions.yaml"
            ) if body_measurement_folder else None,
        )
        meas_fit = (meas if model_type == "smplx"
                    else BodyMeasurements(model_type=model_type))
        gt_faces = fit_faces = faces
    elif synthetic:
        body = SMPLX(model_data=make_synthetic_model_data(
            "smplx", subdivisions=5))
        anchors = MeasurementAnchors.synthetic(
            body.faces, np.asarray(body.params["v_template"]))
        meas = BodyMeasurements(anchors=anchors)
        gt_faces = body.faces
        if model_type == "smplx":
            fit_faces = body.faces
            meas_fit = meas
        else:
            from shapy_tpu.models.body import build_body_model

            fit_body = build_body_model(
                model_type,
                model_data=make_synthetic_model_data(
                    model_type, subdivisions=5))
            fit_faces = fit_body.faces
            meas_fit = BodyMeasurements(
                anchors=MeasurementAnchors.synthetic(
                    fit_body.faces,
                    np.asarray(fit_body.params["v_template"])))
    else:
        meas = BodyMeasurements(
            model_type="smplx",
            meas_definition_path=os.path.join(
                body_measurement_folder, "measurement_defitions.yaml"
            ) if body_measurement_folder else None,
        )
        meas_fit = (
            meas if model_type == "smplx"
            else BodyMeasurements(model_type=model_type)
        )
        body = SMPLX(model_folder=(
            body_model_folder
            or os.path.join(hbw_folder, "body_models")))
        gt_faces = body.faces
        if model_type == "smplx":
            fit_faces = body.faces
        else:
            # SMPL submissions index an SMPL-topology mesh — gathering
            # with SMPL-X faces would silently clamp out-of-range vertex
            # ids and corrupt every measurement/P2P number.
            from shapy_tpu.models.body import build_body_model

            fit_body = build_body_model(
                model_type,
                model_folder=(body_model_folder
                              or os.path.join(hbw_folder, "body_models")))
            fit_faces = fit_body.faces

    def gt_lookup(label: str) -> np.ndarray:
        split, subject = label.split("/")[:2]
        sid = subject.split("_")[0]
        path = os.path.join(hbw_folder, "smplx", split, f"{sid}.npy")
        return np.load(path)

    results = evaluate_submission(
        labels, fits, gt_lookup,
        model_type=model_type,
        point_regressor_gt=preg_gt,
        point_regressor_fit=preg_fit,
        measurements_gt=meas,
        measurements_fit=meas_fit,
        gt_faces=gt_faces,
        fit_faces=fit_faces,
    )

    if "v2v_t" in results:
        print(f"V2V Error: {results['v2v_t'] * 1000:.0f} mm")
    if "p2p_t" in results:
        print(f"P2P-20k Error: {results['p2p_t'] * 1000:.0f} mm")
    for k in ("chest", "waist", "hips", "height"):
        if f"{k}_error" in results:
            print(f"{k} Error: {results[f'{k}_error'] * 1000:.0f} mm")
    if "mass_error" in results:
        print(f"mass Error: {results['mass_error']:.0f} kg")
    return 0


def check_submission_format(
    input_npz_file: str,
    image_names_path: str = "",
    model_type: str = "smplx",
) -> bool:
    """Submission validator (reference hbw_evaluation/
    test_submission_format.py:4-43): npz with image_name (N,) and
    v_shaped (N, 10475, 3) for smplx / (N, 6890, 3) for smpl."""
    expected_v = {"smplx": 10475, "smpl": 6890}[model_type]
    try:
        data = np.load(input_npz_file)
        ok = True
        if "image_name" not in data or "v_shaped" not in data:
            print("Missing required keys: image_name, v_shaped")
            return False
        # Member decompression is lazy: a truncated archive can pass
        # np.load yet fail here (zipfile.BadZipFile / zlib.error), so
        # the array reads stay inside the guard too.
        names = data["image_name"]
        v = data["v_shaped"]
    except Exception as exc:
        # Corrupt/missing/non-npz submission: clean diagnostic + False
        # (nonzero exit from the CLI), never a traceback.
        print(f"Cannot read submission npz {input_npz_file}: {exc}")
        return False
    if v.ndim != 3 or v.shape[1] != expected_v or v.shape[2] != 3:
        print(f"v_shaped must be (N, {expected_v}, 3); got {v.shape}")
        ok = False
    if len(names) != len(v):
        print("image_name and v_shaped lengths differ")
        ok = False
    if image_names_path and os.path.exists(image_names_path):
        expected_names = np.load(image_names_path, allow_pickle=True)
        if sorted(map(str, names)) != sorted(map(str, expected_names)):
            print("image_name entries do not match the test-set list")
            ok = False
    if ok:
        print("Submission format OK")
    return ok


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="HBW offline evaluation")
    parser.add_argument("--input-npz-file", required=True)
    parser.add_argument("--hbw-folder", default="")
    parser.add_argument("--model-type", default="smplx",
                        choices=["smpl", "smplx"])
    parser.add_argument("--point-reg-gt", default="")
    parser.add_argument("--point-reg-fit", default="")
    parser.add_argument("--body-measurement-folder", default="")
    parser.add_argument("--body-model-folder", default="",
                        help="SMPL/SMPL-X model folder "
                             "(reference evaluate_hbw.py:213-218)")
    parser.add_argument("--check-format-only", action="store_true")
    parser.add_argument("--image-names-path", default="")
    parser.add_argument("--faces-path", default="",
                        help="npz with a 'faces' array: use this mesh "
                             "topology instead of loading a body model")
    args = parser.parse_args()
    if args.check_format_only:
        sys.exit(
            0 if check_submission_format(
                args.input_npz_file, args.image_names_path,
                args.model_type)
            else 1
        )
    sys.exit(
        main(
            args.input_npz_file,
            args.hbw_folder,
            args.model_type,
            args.point_reg_gt,
            args.point_reg_fit,
            args.body_measurement_folder,
            args.body_model_folder,
            args.faces_path,
        )
    )

"""Virtual measurements CLI: betas npz -> anthropometric measurements.

Behavioural spec: reference ``measurements/virtual_measurements.py:21-141``
— same flags (--input-folder, --output-folder, --meas_definition_path,
--meas_vertices_path, --smpl_model_path, --num_betas, --gender), same
per-file output line format ("    Virtual measurements:     mass: X kg
...") and optional rendered overlay with the measurements printed on it.

Differences: runs on TPU/CPU via jit (the reference exits with code 3 if
CUDA is missing); set SHAPY_TPU_SYNTHETIC_BODY=1 to fall back to the
synthetic body model when the licensed SMPL-X files are absent.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(
    demo_input_folder: str = "demo_input",
    demo_output_folder: str = "demo_output",
    meas_definition_path: str = "",
    meas_vertices_path: str = "",
    smpl_model_path: str = "../data/body_models",
    gender: str = "neutral",
    num_betas: int = 10,
    render: bool = True,
) -> int:
    import jax
    import jax.numpy as jnp

    from shapy_tpu.measure import BodyMeasurements, MeasurementAnchors
    from shapy_tpu.models.body import SMPLX, make_synthetic_model_data

    os.makedirs(demo_output_folder, exist_ok=True)
    npz_files = sorted(
        f for f in os.listdir(demo_input_folder) if f.endswith("npz")
    )

    synthetic = os.environ.get("SHAPY_TPU_SYNTHETIC_BODY", "0") == "1"
    if synthetic:
        subdiv = int(os.environ.get("SHAPY_TPU_TEST_SUBDIV", "5"))
        model = SMPLX(
            model_data=make_synthetic_model_data("smplx",
                                                 subdivisions=subdiv),
            num_betas=num_betas,
            gender=gender,
        )
        anchors = MeasurementAnchors.synthetic(
            model.faces, np.asarray(model.params["v_template"])
        )
        measurements_module = BodyMeasurements(anchors=anchors)
    else:
        model = SMPLX(
            model_folder=smpl_model_path,
            num_betas=num_betas,
            gender=gender,
        )
        measurements_module = BodyMeasurements(
            model_type="smplx",
            meas_definition_path=meas_definition_path or None,
            meas_vertices_path=meas_vertices_path or None,
        )

    faces = model.faces

    @jax.jit
    def compute(betas):
        v_shaped = model.forward_shape(betas)["v_shaped"]
        tris = v_shaped[:, faces]
        m = measurements_module.forward(tris)["measurements"]
        return v_shaped, {k: v["tensor"] for k, v in m.items()}

    for npz_file in npz_files:
        print(f"Processing: {npz_file}")
        data = np.load(os.path.join(demo_input_folder, npz_file))
        betas = jnp.asarray(data["betas"], jnp.float32).reshape(1, -1)
        v_shaped, meas = compute(betas)

        mmts_str = "    Virtual measurements: "
        for k in ("mass", "height", "chest", "waist", "hips"):
            if k not in meas:
                continue
            value = float(meas[k][0])
            unit = "kg" if k == "mass" else "m"
            mmts_str += f"    {k}: {value:.2f} {unit}"
        print(mmts_str)

        if render:
            from shapy_tpu.render import render_mesh_overlay

            import cv2

            H, W = 512, 512
            verts = np.asarray(v_shaped[0])
            verts = verts - verts.mean(0)
            verts = verts * np.asarray([1.0, -1.0, -1.0])  # y-up to image
            verts[:, 2] += 2.5
            canvas = np.ones((H, W, 3), np.float32)
            img = render_mesh_overlay(
                canvas, verts, faces, focal_length=500.0
            )
            img8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            cv2.putText(
                img8, mmts_str.strip()[:80], (4, 20),
                cv2.FONT_HERSHEY_SIMPLEX, 0.35, (0, 0, 0), 1,
            )
            out_path = os.path.join(
                demo_output_folder, npz_file.replace("npz", "png")
            )
            cv2.imwrite(out_path, cv2.cvtColor(img8, cv2.COLOR_RGB2BGR))
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="SMPL-X virtual measurements demo",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--output-folder", dest="output_folder",
                        default="demo_output", type=str)
    parser.add_argument("--input-folder", dest="input_folder",
                        default="demo_input", type=str)
    parser.add_argument("--meas_definition_path",
                        dest="meas_definition_path", default="", type=str)
    parser.add_argument("--meas_vertices_path", dest="meas_vertices_path",
                        default="", type=str)
    parser.add_argument("--smpl_model_path", dest="smpl_model_path",
                        default="../data/body_models", type=str)
    parser.add_argument("--num_betas", dest="num_betas", default=10,
                        type=int)
    parser.add_argument("--gender", dest="gender", default="neutral",
                        type=str)
    parser.add_argument("--no-render", dest="render", action="store_false")
    return parser


if __name__ == "__main__":
    args = build_parser().parse_args()
    sys.exit(
        main(
            demo_input_folder=args.input_folder,
            demo_output_folder=args.output_folder,
            meas_definition_path=args.meas_definition_path,
            meas_vertices_path=args.meas_vertices_path,
            smpl_model_path=args.smpl_model_path,
            gender=args.gender,
            num_betas=args.num_betas,
            render=args.render,
        )
    )

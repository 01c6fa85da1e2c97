"""Visualise the virtual measurements on a body mesh.

Headless mirror of the reference ``mesh-mesh-intersection/examples/
vis_measurements.py`` (open3d window -> PNG): renders the shaped mesh
with the chest/waist/hips slice points and the height anchors overlaid,
and prints the measurement values.

Run without licensed assets: ``SHAPY_TPU_SYNTHETIC_BODY=1 python
examples/vis_measurements.py --output vis.png``.
"""

import argparse
import os
import sys

import numpy as np


def main() -> int:
    parser = argparse.ArgumentParser(
        description="Render virtual measurements on a body mesh")
    parser.add_argument("--model-folder", default="", type=str)
    parser.add_argument("--model-type", default="smplx", type=str)
    parser.add_argument("--gender", type=str, default="neutral")
    parser.add_argument("--num-betas", default=10, type=int)
    parser.add_argument("--betas", type=float, nargs="*", default=[])
    parser.add_argument("--output", type=str, default="vis_measurements.png")
    parser.add_argument("--image-size", type=int, default=512)
    args = parser.parse_args()

    import jax.numpy as jnp

    from shapy_tpu.measure import BodyMeasurements, MeasurementAnchors
    from shapy_tpu.models.body import (
        build_body_model,
        make_synthetic_model_data,
    )
    from shapy_tpu.render.rasterizer import rasterize_mesh

    if os.environ.get("SHAPY_TPU_SYNTHETIC_BODY", "0") == "1" or (
            not args.model_folder):
        model = build_body_model(
            args.model_type,
            model_data=make_synthetic_model_data(
                args.model_type, subdivisions=4),
            num_betas=args.num_betas,
        )
        meas = BodyMeasurements(anchors=MeasurementAnchors.synthetic(
            model.faces, np.asarray(model.params["v_template"])))
    else:
        model = build_body_model(
            args.model_type, model_folder=args.model_folder,
            gender=args.gender, num_betas=args.num_betas,
        )
        meas = BodyMeasurements(model_type=args.model_type)

    betas = np.zeros((1, model.num_betas), np.float32)
    if args.betas:
        betas[0, :len(args.betas)] = args.betas
    v = np.asarray(model(betas=jnp.asarray(betas))["v_shaped"][0])

    # Full AoS forward: this offline path wants the slice point clouds.
    out = meas.forward(jnp.asarray(v[None])[:, model.faces])["measurements"]
    for name in ("mass", "height", "chest", "waist", "hips"):
        print(f"{name:7s}: {float(np.asarray(out[name]['tensor'])[0]):.4f}")

    # Camera: place the body ~3 m in front, y-up flipped to image coords.
    S = args.image_size
    cam_v = v * np.array([1.0, -1.0, -1.0]) + np.array([0.0, 0.0, 3.0])
    focal = 1.2 * S
    shading, mask = rasterize_mesh(
        cam_v, model.faces, (S, S), focal_length=focal)
    img = np.full((S, S, 3), 255, np.uint8)
    base = (np.stack([shading * 0.7 + 0.2] * 3, -1) * 255).astype(np.uint8)
    img[mask] = base[mask]

    colors = {"chest": (220, 40, 40), "waist": (40, 160, 40),
              "hips": (40, 60, 220)}
    for name, color in colors.items():
        pts = np.asarray(out[name]["points"][0]).reshape(-1, 3)
        valid = np.asarray(out[name]["valid_points"][0]).reshape(-1)
        if valid.shape[0] != pts.shape[0]:
            # exact slice mode: one validity flag per triangle's 2 points
            valid = np.repeat(valid, 2)
        pts = pts[valid]
        cam_p = pts * np.array([1.0, -1.0, -1.0]) + np.array([0, 0, 3.0])
        px = (focal * cam_p[:, 0] / cam_p[:, 2] + S / 2).astype(int)
        py = (focal * cam_p[:, 1] / cam_p[:, 2] + S / 2).astype(int)
        ok = (px >= 0) & (px < S) & (py >= 0) & (py < S)
        img[py[ok], px[ok]] = color

    try:
        import cv2

        cv2.imwrite(args.output, img[..., ::-1])
    except ImportError:
        from PIL import Image

        Image.fromarray(img).save(args.output)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

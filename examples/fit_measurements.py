"""Fit SMPL-X betas to target anthropometric measurements.

CLI mirror of the reference ``mesh-mesh-intersection/examples/
fit_measurements.py:236-260`` (same flags: --model-folder/--model-type/
--gender/--num-betas/--height/--mass/--chest/--waist/--hips; negative
target = unused), driving the TPU-native differentiable measurement op
via :func:`shapy_tpu.measure.fit_measurements.fit_betas_to_measurements`
(optax Adam on the support-function hull instead of the reference's
TrustRegion loop over the CUDA BVH op).

Run without licensed assets: ``SHAPY_TPU_SYNTHETIC_BODY=1 python
examples/fit_measurements.py --height 1.8 --chest 1.0``.
"""

import argparse
import os
import sys

import numpy as np


def main() -> int:
    parser = argparse.ArgumentParser(
        description="Fit body shape to virtual measurements")
    parser.add_argument("--model-folder", default="", type=str)
    parser.add_argument("--model-type", default="smplx", type=str,
                        choices=["smpl", "smplh", "smplx"])
    parser.add_argument("--gender", type=str, default="neutral")
    parser.add_argument("--num-betas", default=10, type=int)
    parser.add_argument("--height", type=float, default=1.80)
    parser.add_argument("--mass", type=float, default=-1)
    parser.add_argument("--chest", type=float, default=-1)
    parser.add_argument("--waist", type=float, default=-1)
    parser.add_argument("--hips", type=float, default=-1)
    parser.add_argument("--num-steps", type=int, default=200)
    parser.add_argument("--output-ply", type=str, default="")
    args = parser.parse_args()

    from shapy_tpu.measure import BodyMeasurements, MeasurementAnchors
    from shapy_tpu.measure.fit_measurements import (
        fit_betas_to_measurements,
    )
    from shapy_tpu.models.body import (
        build_body_model,
        make_synthetic_model_data,
    )

    if os.environ.get("SHAPY_TPU_SYNTHETIC_BODY", "0") == "1" or (
            not args.model_folder):
        model = build_body_model(
            args.model_type,
            model_data=make_synthetic_model_data(
                args.model_type, subdivisions=4),
            num_betas=args.num_betas,
        )
        anchors = MeasurementAnchors.synthetic(
            model.faces, np.asarray(model.params["v_template"]))
        meas = BodyMeasurements(anchors=anchors)
    else:
        model = build_body_model(
            args.model_type, model_folder=args.model_folder,
            gender=args.gender, num_betas=args.num_betas,
        )
        meas = BodyMeasurements(model_type=args.model_type)

    targets = {
        k: v for k, v in (
            ("height", args.height), ("mass", args.mass),
            ("chest", args.chest), ("waist", args.waist),
            ("hips", args.hips),
        ) if v > 0
    }
    if not targets:
        print("No positive measurement targets given", file=sys.stderr)
        return 1

    result = fit_betas_to_measurements(
        model, meas, targets, num_steps=args.num_steps)
    fitted = {k: float(np.asarray(v)[0])
              for k, v in result["measurements"].items()}
    print("targets: ", {k: round(v, 4) for k, v in targets.items()})
    print("fitted:  ", {k: round(v, 4) for k, v in fitted.items()
                        if k in targets})
    print("betas:   ", np.round(np.asarray(result["betas"])[0], 3).tolist())

    if args.output_ply:
        from shapy_tpu.render import save_ply

        import jax.numpy as jnp
        v = model(betas=result["betas"])["v_shaped"]
        save_ply(args.output_ply, np.asarray(v[0]), model.faces)
        print(f"wrote {args.output_ply}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

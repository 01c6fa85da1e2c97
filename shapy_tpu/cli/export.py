"""Export the flagship regressor as a production serving artifact.

The reference has no export path (serving = re-running
``regressor/demo.py`` in-process); this is the TPU-native equivalent:
a StableHLO artifact via ``jax.export`` plus path-keyed weight npzs, so
a serving process can run the model without the construction code.

    python -m shapy_tpu.cli.export --exp-cfg config.yaml \\
        --checkpoint path/to/ckpt --output-dir artifact/ --check

``--batch-size`` fixes the batch dimension (default: symbolic — one
artifact serves every batch size). ``--check`` reloads the artifact and
verifies its outputs match the live model on random inputs.
"""

from __future__ import annotations

import argparse
import sys


def main() -> int:
    parser = argparse.ArgumentParser(
        description="Export the regressor as a jax.export serving artifact",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--exp-cfg", dest="exp_cfgs", nargs="+", default=[])
    parser.add_argument("--exp-opts", dest="exp_opts", nargs="*", default=[])
    parser.add_argument("--checkpoint", default="",
                        help="reference torch or native checkpoint to load")
    parser.add_argument("--output-dir", default="serving_artifact")
    parser.add_argument("--batch-size", type=int, default=None,
                        help="fixed batch size (default: symbolic batch)")
    parser.add_argument("--image-size", type=int, default=256)
    parser.add_argument("--platforms", nargs="+", default=["tpu", "cpu"])
    parser.add_argument("--from-full-images", action="store_true",
                        help="export the fused ingest path: uint8 full "
                             "frames + crop affines, on-device "
                             "crop/normalize (4x smaller transfers)")
    parser.add_argument("--full-image-size", nargs=2, type=int,
                        default=[480, 360], metavar=("H", "W"))
    parser.add_argument("--check", action="store_true",
                        help="reload the artifact and verify numerics")
    args = parser.parse_args()

    import numpy as np

    from shapy_tpu.cli.demo import build_demo_regressor
    from shapy_tpu.io.export import (ServingModel, make_serving_fn,
                                     save_serving_artifact)
    from shapy_tpu.utils.config import load_config

    cfg = load_config({}, args.exp_cfgs, args.exp_opts)
    regressor = build_demo_regressor(cfg, args.checkpoint)

    metadata = save_serving_artifact(
        args.output_dir,
        regressor,
        batch_size=args.batch_size,
        image_size=args.image_size,
        platforms=args.platforms,
        from_full_images=args.from_full_images,
        full_image_size=tuple(args.full_image_size),
    )
    print(f"wrote serving artifact to {args.output_dir} "
          f"(platforms={metadata['platforms']}, batch={metadata['batch']}, "
          f"input={metadata['input_layout']})")

    if args.check:
        served = ServingModel.load(args.output_dir)
        batch = args.batch_size or 2
        rng = np.random.RandomState(0)
        import jax

        # jit the live reference too: compiled-vs-compiled keeps the
        # comparison at numerical-noise level regardless of backbone
        # compute dtype (eager-vs-compiled fusion differences can exceed
        # a fixed tolerance for bf16 configs).
        fn = jax.jit(make_serving_fn(
            regressor, from_full_images=args.from_full_images,
            crop_size=args.image_size))
        if args.from_full_images:
            height, width = args.full_image_size
            frames = rng.randint(0, 256, (batch, height, width, 3)
                                 ).astype(np.uint8)
            scale = np.diag([width / args.image_size,
                             height / args.image_size, 1.0]
                            ).astype(np.float32)
            affines = np.broadcast_to(scale, (batch, 3, 3)).copy()
            got = served.predict(frames, affines)
            want = fn(regressor.params, regressor.model.params,
                      frames, affines)
        else:
            images = rng.uniform(
                -1, 1, (batch, args.image_size, args.image_size, 3)
            ).astype(np.float32)
            got = served.predict(images)
            want = fn(regressor.params, regressor.model.params, images)

        errs = jax.tree.map(
            lambda a, b: float(np.max(np.abs(np.asarray(a, np.float64)
                                             - np.asarray(b, np.float64)))),
            got, want,
        )
        worst = max(jax.tree.leaves(errs), default=0.0)
        print(f"round-trip check: max |delta| = {worst:.3e}")
        if worst > 1e-4:
            print("CHECK FAILED", file=sys.stderr)
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

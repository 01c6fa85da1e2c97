"""One-shot conversion: reference torch checkpoint -> native orbax.

The demo/evaluate CLIs can import a reference SHAPY checkpoint on the
fly (``pretrained:`` in the config); this tool does the conversion once
and writes a native orbax checkpoint + pointer files, so subsequent runs
load without torch in the loop:

    python -m shapy_tpu.cli.import_checkpoint \\
        --torch-checkpoint path/to/shapy_ckpt --exp-cfg config.yaml \\
        --output-dir converted/

Covers the full-model format (reference checkpointer layout:
``backbone.*`` + ``regressor.module.*`` keys); for backbone-only or
Lightning polynomial checkpoints use ``hrnet_import`` /
``Polynomial.load_torch_checkpoint`` directly.
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> int:
    parser = argparse.ArgumentParser(
        description="Convert a reference torch checkpoint to orbax")
    parser.add_argument("--torch-checkpoint", required=True)
    parser.add_argument("--exp-cfg", dest="exp_cfgs", nargs="+",
                        default=[])
    parser.add_argument("--exp-opts", dest="exp_opts", nargs="*",
                        default=[])
    parser.add_argument("--output-dir", default="converted_checkpoint")
    args = parser.parse_args()

    from shapy_tpu.cli.demo import build_demo_regressor
    from shapy_tpu.io.checkpoint import Checkpointer
    from shapy_tpu.io.model_import import load_reference_model_checkpoint
    from shapy_tpu.utils.config import load_config

    if not os.path.exists(args.torch_checkpoint):
        print(f"checkpoint not found: {args.torch_checkpoint}",
              file=sys.stderr)
        return 1

    cfg = load_config({}, args.exp_cfgs, args.exp_opts)
    regressor = build_demo_regressor(cfg)
    params = load_reference_model_checkpoint(
        args.torch_checkpoint, regressor.params
    )

    ckptr = Checkpointer(save_dir=args.output_dir)
    path = ckptr.save({"params": params}, step=0, is_best=True)
    n = sum(
        1 for _ in __import__("jax").tree_util.tree_leaves(params)
    )
    print(f"wrote {path} ({n} arrays)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

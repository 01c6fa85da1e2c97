"""Learning-proof bench on the real chip: metric-vs-step decay through
cli/train.py, with a mid-run kill+resume, on the synthetic supervised
task (shapy_tpu/data/synthetic.py).

Produces the BENCH.md rows: steps-to-target (held-out v2v <= 0.65 x
untrained baseline), wall-clock per leg, and the kill+resume identity
check (4+4 steps vs 8 steps, parameter-for-parameter).

Run on the TPU (default JAX platform):
    PYTHONPATH=/root/repo python tools/learn_bench.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("SHAPY_TPU_SYNTHETIC_BODY", "1")
os.environ.setdefault("SHAPY_TPU_TEST_SUBDIV", "2")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/shapy_learn_bench")
    ap.add_argument("--out", default="/tmp/shapy_learn_bench/out")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--crop", type=int, default=96)
    ap.add_argument("--image-size", type=int, default=112)
    ap.add_argument("--depth", type=int, default=50,
                    help="resnet depth for the scaled flagship backbone")
    ap.add_argument("--leg-steps", type=int, default=150)
    ap.add_argument("--eval-steps", type=int, default=75)
    ap.add_argument("--n-train", type=int, default=128)
    ap.add_argument("--n-val", type=int, default=32)
    args = ap.parse_args()

    import numpy as np

    from shapy_tpu.data.synthetic import (
        generate_parametric_fits,
        register_synthetic_datasets,
        synthetic_train_config,
    )

    gen = dict(image_size=args.image_size, subdivisions=2, pose_std=0.0,
               global_std=(0.0, 0.45, 0.0), betas_std=2.5,
               active_betas=2)
    t0 = time.time()
    for name, n, seed in (("pose_a", args.n_train, 1),
                          ("pose_b", args.n_train, 2),
                          ("shape_a", args.n_train, 3),
                          ("val", args.n_val, 9)):
        if not os.path.exists(os.path.join(args.root, name, "fits.npz")):
            generate_parametric_fits(
                os.path.join(args.root, name), n, seed=seed, **gen)
    print(json.dumps({"datagen_s": round(time.time() - t0, 1)}))

    register_synthetic_datasets(("pose_a", "pose_b", "shape_a", "val"))
    cfg = synthetic_train_config(
        args.root, batch_size=args.batch_size, crop_size=args.crop,
        lr=1e-3, num_stages=2,
        backbone={"type": "resnet", "depth": args.depth})
    cfg.update({"summary_steps": 50,
                "checkpoint_steps": args.leg_steps,
                "eval_steps": args.eval_steps})

    from shapy_tpu.cli.train import main as train_main

    # leg 1 (fresh) -> checkpoint -> "kill" -> leg 2 (resume)
    wall = {}
    for leg in (1, 2):
        t = time.time()
        rc = train_main(cfg, output_folder=args.out,
                        num_steps=args.leg_steps)
        wall[f"leg{leg}_s"] = round(time.time() - t, 1)
        assert rc == 0
    print(json.dumps({"wall_clock": wall,
                      "total_steps": 2 * args.leg_steps}))

    # kill+resume identity: 8 uninterrupted vs 4 + resume + 4
    import jax

    from shapy_tpu.cli.demo import build_demo_regressor
    from shapy_tpu.io.checkpoint import Checkpointer
    from shapy_tpu.train import RegressorLosses
    from shapy_tpu.train.trainer import Trainer

    id_cfg = dict(cfg, checkpoint_steps=4, eval_steps=0)
    out_a = os.path.join(args.out, "ident_a")
    out_b = os.path.join(args.out, "ident_b")
    assert train_main(id_cfg, output_folder=out_a, num_steps=8) == 0
    assert train_main(id_cfg, output_folder=out_b, num_steps=4) == 0
    assert train_main(id_cfg, output_folder=out_b, num_steps=4) == 0

    regressor = build_demo_regressor(cfg)
    losses = RegressorLosses(dict(cfg["losses"]))

    def final_params(folder):
        tr = Trainer(regressor, losses, optim_cfg=dict(cfg["optim"]),
                     checkpointer=Checkpointer(
                         save_dir=os.path.join(folder, "checkpoints")))
        tr.resume()
        assert int(tr.state.step) == 8
        return tr.state.params

    pa = jax.tree_util.tree_leaves(final_params(out_a))
    pb = jax.tree_util.tree_leaves(final_params(out_b))
    max_dev = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                  for a, b in zip(pa, pb))
    print(json.dumps({"kill_resume_max_param_dev": max_dev,
                      "identical": max_dev == 0.0}))


if __name__ == "__main__":
    main()

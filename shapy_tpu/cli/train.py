"""Training entry point (new capability — the reference ships none).

Wires the layered config into: model build (+ optional checkpoint
resume), pose/shape data loaders, losses from the config's ``losses``
section, the mesh, and the Trainer. Config shape matches the reference's
training YAML (b2a_expose_hrnet_demo.yaml) so the same files drive both.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict


def main(exp_cfg: Dict, output_folder: str = "output",
         num_steps: int = 0, num_devices_data: int = 0) -> int:
    
    from shapy_tpu.cli.demo import build_demo_regressor
    from shapy_tpu.data.build import build_all_data_loaders
    from shapy_tpu.io.checkpoint import Checkpointer
    from shapy_tpu.losses.priors import GenderShapePrior
    from shapy_tpu.parallel import make_mesh
    from shapy_tpu.train import RegressorLosses
    from shapy_tpu.train.trainer import Trainer

    os.makedirs(output_folder, exist_ok=True)
    regressor = build_demo_regressor(
        exp_cfg, os.path.expandvars(exp_cfg.get("pretrained", "") or "")
    )

    loaders = build_all_data_loaders(
        exp_cfg,
        split="train",
        target_keypoint_names=regressor.model.keypoint_names,
    )
    if not loaders:
        print("No training datasets configured", file=sys.stderr)
        return 1

    loss_cfg = dict(exp_cfg.get("losses") or {})
    shape_prior = None
    prior_cfg = dict(
        (dict(loss_cfg.get("body") or {}).get("shape") or {}).get(
            "prior") or {}
    )
    if prior_cfg.get("type") == "gender-shape":
        gs = dict(prior_cfg.get("gender_shape") or {})
        f_path = os.path.expandvars(gs.get("female_stats_path", ""))
        m_path = os.path.expandvars(gs.get("male_stats_path", ""))
        if os.path.exists(f_path) and os.path.exists(m_path):
            shape_prior = GenderShapePrior(
                female_stats_path=f_path, male_stats_path=m_path
            )
    losses = RegressorLosses(loss_cfg, gender_shape_prior=shape_prior)

    mesh = None
    if num_devices_data > 1:
        mesh = make_mesh(data=num_devices_data, model=1)

    checkpointer = Checkpointer(
        save_dir=os.path.join(output_folder, "checkpoints"),
        pretrained=os.path.expandvars(exp_cfg.get("pretrained", "") or ""),
    )
    # Adversarial training: the exact config surface the reference
    # declares but stubs out (defaults.py:79 use_adv_training,
    # models/build.py:26-31, optim_defaults.py:59 optim.discriminator).
    optim_cfg = dict(exp_cfg.get("optim") or {})
    use_adv = bool(exp_cfg.get("use_adv_training", False))
    net_cfg = dict(exp_cfg.get("network") or {})
    trainer = Trainer(
        regressor,
        losses,
        optim_cfg=optim_cfg,
        checkpointer=checkpointer,
        mesh=mesh,
        summary_steps=int(exp_cfg.get("summary_steps", 100)),
        checkpoint_steps=int(exp_cfg.get("checkpoint_steps", 1000)),
        max_duration=float(exp_cfg.get("max_duration", float("inf"))),
        use_adv_training=use_adv,
        disc_cfg=dict(net_cfg.get("discriminator") or {}),
        adv_loss_cfg=dict(loss_cfg.get("discriminator") or {}),
        disc_optim_cfg=dict(optim_cfg.get("discriminator") or {}) or None,
    )
    trainer.resume()

    # Evaluator in the loop: when a val split is configured and
    # eval_steps > 0, run the full Evaluator (v2v / mpjpe / measurement
    # errors) every eval_steps, plus once before training (the baseline
    # the decay is judged against) and once at the end.
    eval_fn = None
    eval_steps = int(exp_cfg.get("eval_steps", 0))
    eval_results: Dict = {}
    if eval_steps > 0:
        val_loaders = build_all_data_loaders(
            exp_cfg, split="val",
            target_keypoint_names=regressor.model.keypoint_names,
            enable_augment=False,
        )
        if val_loaders:
            from shapy_tpu.eval.loop import make_eval_fn

            eval_fn = make_eval_fn(regressor, val_loaders, exp_cfg,
                                   results_sink=eval_results)
            eval_fn(trainer.state, int(trainer.state.step))

    if num_steps <= 0:
        optim_cfg = dict(exp_cfg.get("optim") or {})
        num_steps = int(optim_cfg.get("num_steps", 1000))
    metrics = trainer.fit(loaders, num_steps=num_steps,
                          eval_fn=eval_fn, eval_steps=eval_steps)
    if eval_fn is not None and int(trainer.state.step) % eval_steps:
        eval_fn(trainer.state, int(trainer.state.step))
    print({k: round(v, 4) for k, v in metrics.items()})
    for step, by_ds in sorted(eval_results.items()):
        for ds, vals in by_ds.items():
            print({"eval": ds, "step": step,
                   **{k: round(float(v), 5) for k, v in vals.items()}})
    return 0


if __name__ == "__main__":
    from shapy_tpu.utils.config import load_config

    parser = argparse.ArgumentParser(
        description="shapy_tpu training",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--exp-cfg", dest="exp_cfgs", nargs="+",
                        default=[])
    parser.add_argument("--exp-opts", dest="exp_opts", nargs="*",
                        default=[])
    parser.add_argument("--output-folder", default="output")
    parser.add_argument("--num-steps", type=int, default=0)
    parser.add_argument("--num-devices", type=int, default=0)
    args = parser.parse_args()
    cfg = load_config({}, args.exp_cfgs, args.exp_opts)
    from shapy_tpu.utils.device import (exit_on_device_failure,
        raise_open_file_limit)

    raise_open_file_limit()  # reference demo.py:31-32
    exit_on_device_failure()  # scheduler-resubmittable device failure
    sys.exit(main(cfg, args.output_folder, args.num_steps,
                  args.num_devices))

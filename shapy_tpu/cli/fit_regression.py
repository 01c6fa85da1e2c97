"""Train / evaluate the A2S (a2b) and S2A (b2a) attribute models.

Behavioural spec: reference ``attributes/fit_linear_regression.py:18-173``
— same layered config (the s2a.yaml / a2s_variations_polynomial configs
work unchanged), ``--train`` flag to fit + checkpoint
(``<output_dir>/last.ckpt``), otherwise evaluation with the reference's
LaTeX-ish table output for b2a and per-metric reporting for a2b.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict


def main(cfg: Dict, train: bool, eval_test: bool = False) -> int:
    from shapy_tpu.models.attributes.build import build
    from shapy_tpu.models.attributes.regression_data import RegressionDataset

    ds_names = cfg.get("dataset", ["caesar"])
    ds_name = ds_names[0] if isinstance(ds_names, (list, tuple)) \
        else ds_names
    output_dir = os.path.expandvars(cfg.get("output_dir", "output"))
    os.makedirs(output_dir, exist_ok=True)
    checkpoint_path = os.path.join(output_dir, "last.ckpt")
    network_type = cfg.get("type", "a2b")

    def make_dataset(name):
        if name == "synthetic-db" or cfg.get("use_synthetic_db"):
            return RegressionDataset.synthetic(
                ds_gender=cfg.get("ds_gender", "female"),
                model_gender=cfg.get("model_gender", "neutral"),
                model_type=cfg.get("model_type", "smplx"),
                num_betas=int(cfg.get("num_shape_comps", 10)),
            )
        return RegressionDataset(
            ds_name=name,
            ds_gender=cfg.get("ds_gender", "female"),
            model_gender=cfg.get("model_gender", "neutral"),
            model_type=cfg.get("model_type", "smplx"),
            db_folder=cfg.get("db_folder", "../data/dbs"),
        )

    if train:
        dataset = make_dataset(ds_name)
        fitter = build(cfg)
        report = fitter.fit(dataset.db)
        print("Validation report:")
        for split, metrics in report.items():
            for k, v in metrics.items():
                import numpy as np

                val = float(np.mean(v))
                print(f"  {split}/{k}: {val:.4f}")
        # Save in our npz polynomial format next to a Lightning-style name
        from shapy_tpu.models.attributes.polynomial import Polynomial

        net = getattr(fitter, "a2b", getattr(fitter, "b2a", None))
        if isinstance(net, Polynomial):
            net.save_checkpoint(checkpoint_path + ".npz")
            print(f"Saved checkpoint: {checkpoint_path}.npz")
        return 0

    # Evaluation path
    import numpy as np

    model_cls_key = network_type
    from shapy_tpu.models.attributes.build import MODEL_DICT

    npz_path = checkpoint_path + ".npz"
    if os.path.exists(checkpoint_path) or os.path.exists(npz_path):
        model = MODEL_DICT[model_cls_key](cfg)
        from shapy_tpu.models.attributes.polynomial import Polynomial

        net = getattr(model, "a2b", getattr(model, "b2a", None))
        if isinstance(net, Polynomial) and os.path.exists(npz_path):
            loaded = Polynomial.load_checkpoint(npz_path)
            net.params = loaded.params
        elif os.path.exists(checkpoint_path):
            model = MODEL_DICT[model_cls_key].load_from_checkpoint(
                checkpoint_path, cfg=cfg
            )
    else:
        print(f"No checkpoint found at {checkpoint_path}",
              file=sys.stderr)
        return 1

    eval_sets = ["caesar", "models"] if network_type == "a2b" \
        else ["caesar"]
    if cfg.get("use_synthetic_db"):
        eval_sets = ["synthetic-db"]
    for name in eval_sets:
        dataset = make_dataset(name)
        if "val" not in dataset.db:
            continue
        if network_type == "a2b":
            beta_key = f"betas_{model.model_type}_{model.model_gender}"
            xv = model.create_input_feature_vec(dataset.db["val"])
            yv = np.asarray(
                dataset.db["val"][beta_key])[:, : model.betas_size]
            pred = model.a2b.predict(model.preprocess(xv))
            report = model.validate(yv, pred)
            print(f"Results on {name} validation set:")
            for k, v in report.items():
                print(f"  {k}: {v:.4f}")
        else:
            beta_key = f"betas_{model.model_type}_{model.model_gender}"
            xv = np.asarray(dataset.db["val"][beta_key])[
                :, : model.betas_size]
            yv = np.asarray(dataset.db["val"]["rating"])
            pred = model.b2a.predict(xv)
            m = model.metrics(yv[:, model.selected_attr_idx]
                              if yv.shape[1] != pred.shape[1] else yv,
                              pred)
            print(f"Reporting results on {name} validation set")
            for i, nme in enumerate(model.output_names):
                l1m = float(m["l1_mean"][i])
                l1std = float(m["l1_std"][i])
                acc = float(m["class_accuracy"][i]) * 100
                print(f"{nme:20s} &   ${l1m:.2f} \\pm {l1std:.2f}$   &"
                      f"   ${acc:.2f}\\%$   &   &   \\\\")
    return 0


if __name__ == "__main__":
    from shapy_tpu.utils.config import load_config

    parser = argparse.ArgumentParser(
        description="A2S and S2A regressor",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--exp-cfg", dest="exp_cfgs", nargs="+",
                        default=[])
    parser.add_argument("--exp-opts", dest="exp_opts", nargs="*",
                        default=[])
    parser.add_argument("--train", action="store_true")
    parser.add_argument("--eval-test", action="store_true")
    args = parser.parse_args()
    cfg = load_config({}, args.exp_cfgs, args.exp_opts)
    sys.exit(main(cfg, args.train, args.eval_test))

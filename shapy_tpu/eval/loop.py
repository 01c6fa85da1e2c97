"""In-training evaluation: run the Evaluator over val loaders from a
TrainState.

The reference never evaluates during training (its Evaluator only runs
from evaluate.py); this hook closes that loop the TPU-native way — the
eval forward is jitted once and reused across calls, and the Evaluator's
streaming accumulators keep memory flat (reference surface:
``regressor/evaluate.py:44-139`` for the loader→Evaluator chain)."""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from shapy_tpu.eval.evaluator import build_evaluator
from shapy_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def adapt_eval_batches(loader):
    """Collate output -> the batch dicts Evaluator.run consumes.

    THE canonical field mapping — ``cli/evaluate.py`` consumes this same
    generator, so offline and in-training evaluation can never drift."""
    import numpy as np

    from shapy_tpu.eval.evaluator import bmi_bucket, bmi_hist_group

    for batch in loader:
        targets = {}
        for src, dst in (
            ("gt_v_shaped", "gt_v_shaped"),
            ("gt_vertices", "gt_vertices"),
            ("joints3d", "gt_joints3d"),
            ("joints14", "gt_joints14"),
            ("joints14_valid", "joints14_valid"),
        ):
            if src in batch:
                targets[dst] = jnp.asarray(batch[src])
        for key in ("height", "chest", "waist", "hips", "mass"):
            if f"{key}_gt" in batch:
                targets[key] = jnp.asarray(batch[f"{key}_gt"])
        out = {
            "images": batch["images"],
            "targets": targets,
            "model_batch": {"gender": batch["gender"]},
            "genders": batch.get("genders"),
        }
        # BMI breakdowns from GT height/mass (reference
        # evaluation.py:722-752 uses the targets' height/weight):
        # histogram groups for the per-metric bar figures, bucket names
        # for the per-gender/BMI group means.
        if "height_gt" in batch and "mass_gt" in batch:
            h = np.asarray(batch["height_gt"], np.float64).reshape(-1)
            m = np.asarray(batch["mass_gt"], np.float64).reshape(-1)
            out["bmi_hist_groups"] = bmi_hist_group(h, m)
            out["bmi_buckets"] = [
                bmi_bucket(hh, mm) for hh, mm in zip(h, m)
            ]
        yield out


def make_eval_fn(
    regressor,
    val_loaders: Dict,
    exp_cfg: Optional[Dict] = None,
    results_sink: Optional[Dict] = None,
) -> Callable:
    """Returns ``eval_fn(state, step=0) -> {dataset: {metric: value}}``
    suitable for Trainer.fit's eval hook. ``results_sink`` (if given)
    records the history: ``results_sink[step] = results``."""
    evaluator = build_evaluator(
        exp_cfg or {},
        keypoint_names=regressor.model.keypoint_names,
        render_summaries=False,
    )
    last_stage = f"stage_{regressor.num_stages - 1:02d}"

    @jax.jit
    def forward(params, images, gender):
        return regressor.apply(params, images, batch={"gender": gender})

    def eval_fn(state, step: int = 0) -> Dict[str, Dict[str, float]]:
        def model_fn(images, model_batch):
            imgs = jnp.asarray(images)
            gender = jnp.asarray(
                (model_batch or {}).get(
                    "gender", jnp.zeros(imgs.shape[0], jnp.int32))
            )
            return forward(state.params, imgs, gender)

        results = evaluator.run(
            model_fn,
            {part: adapt_eval_batches(loader)
             for part, loader in val_loaders.items()},
            step=step,
            last_stage=last_stage,
        )
        for ds, metrics in results.items():
            pretty = {k: round(float(v), 5) for k, v in metrics.items()}
            logger.info("eval step %d [%s]: %s", step, ds, pretty)
        if results_sink is not None:
            results_sink[int(step)] = results
        return results

    return eval_fn

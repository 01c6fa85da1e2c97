"""The learning proof: training through cli/train.py actually LEARNS.

Closes the one "does it actually work" gap on the train axis: a synthetic
supervised task built entirely from the repo's own pieces (rendered crops
of the synthetic SMPL-X body with known betas/pose,
shapy_tpu/data/synthetic.py) is trained from scratch THROUGH the
production CLI — EqualSampler over two pose archives, a pose/shape
batch mix, checkpointing, a mid-run kill + resume, and the Evaluator in
the loop — and the held-out v2v must drop by a pre-registered factor.

Pre-registered bound (from the calibration run recorded in BENCH.md):
initial (untrained) val v2v ≈ 94 mm on this task; after 300 steps the
measured value is 36-46 mm, so the test requires ≤ 0.65 × initial.

A second test proves kill+resume is BIT-identical: N steps uninterrupted
equals N/2 + resume + N/2 (deterministic batch streams via sampler-level
epoch burn + skip, per-step fold_in rng, exact optimizer-state
checkpointing).

Reference surface: the training machinery the reference declares but
never ships runnable (optimizers/build.py:14-63, exp cfg run surface).
"""

import ast
import os

import numpy as np
import pytest

HEAVY_ENV = {"SHAPY_TPU_SYNTHETIC_BODY": "1", "SHAPY_TPU_TEST_SUBDIV": "1"}

GEN = dict(image_size=56, subdivisions=1, pose_std=0.0,
           global_std=(0.0, 0.45, 0.0), betas_std=2.5, active_betas=2)

ARCHIVES = (("pose_a", 64, 1), ("pose_b", 64, 2),
            ("shape_a", 64, 3), ("val", 16, 9))


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    os.environ.update(HEAVY_ENV)
    from shapy_tpu.data.synthetic import (
        generate_parametric_fits,
        register_synthetic_datasets,
    )

    root = str(tmp_path_factory.mktemp("synth"))
    for name, n, seed in ARCHIVES:
        generate_parametric_fits(os.path.join(root, name), n,
                                 seed=seed, **GEN)
    register_synthetic_datasets([a[0] for a in ARCHIVES])
    return root


def _cfg(root, **overrides):
    from shapy_tpu.data.synthetic import synthetic_train_config

    cfg = synthetic_train_config(root, batch_size=8, crop_size=48,
                                 lr=1e-3, num_stages=1)
    cfg.update({"summary_steps": 75, "checkpoint_steps": 150,
                "eval_steps": 150})
    cfg.update(overrides)
    return cfg


def _eval_rows(captured: str):
    rows = []
    for line in captured.splitlines():
        line = line.strip()
        if line.startswith("{'eval'"):
            rows.append(ast.literal_eval(line))
    return rows


@pytest.mark.slow
def test_training_learns_through_cli_with_resume(synth_root, tmp_path,
                                                 capsys):
    """300 steps from scratch through cli/train.py — killed at step 150
    and resumed in a fresh main() call — must drop held-out v2v to
    ≤ 0.65 × the untrained baseline (pre-registered; measured ~0.4-0.5)."""
    from shapy_tpu.cli.train import main

    out = str(tmp_path / "run")
    cfg = _cfg(synth_root)

    # leg 1: fresh run, checkpoint at 150, then "killed"
    assert main(cfg, output_folder=out, num_steps=150) == 0
    leg1 = _eval_rows(capsys.readouterr().out)
    # leg 2: brand-new process state — resume from the checkpoint
    assert main(cfg, output_folder=out, num_steps=150) == 0
    leg2 = _eval_rows(capsys.readouterr().out)

    by_step = {r["step"]: r for r in leg1 + leg2}
    assert 0 in by_step and 300 in by_step, sorted(by_step)
    v0, vT = by_step[0]["v2v"], by_step[300]["v2v"]
    # sanity: the untrained baseline is in the calibrated ballpark
    assert 0.05 < v0 < 0.2, v0
    assert vT <= 0.65 * v0, (
        f"held-out v2v only reached {vT * 1000:.1f} mm from "
        f"{v0 * 1000:.1f} mm (needs ≤ {0.65 * v0 * 1000:.1f})"
    )
    # the resume really continued (leg 2 saw steps > 150)
    assert int(by_step[300]["step"]) == 300


@pytest.mark.slow
def test_resume_is_bit_identical(synth_root, tmp_path):
    """8 uninterrupted steps == 4 steps + kill + resume + 4 steps,
    parameter-for-parameter (same batches, same rng, restored optimizer
    state)."""
    import jax

    from shapy_tpu.cli.demo import build_demo_regressor
    from shapy_tpu.cli.train import main
    from shapy_tpu.io.checkpoint import Checkpointer
    from shapy_tpu.train import RegressorLosses
    from shapy_tpu.train.trainer import Trainer

    cfg = _cfg(synth_root, checkpoint_steps=4, eval_steps=0)
    out_a = str(tmp_path / "uninterrupted")
    out_b = str(tmp_path / "resumed")

    assert main(cfg, output_folder=out_a, num_steps=8) == 0
    assert main(cfg, output_folder=out_b, num_steps=4) == 0
    assert main(cfg, output_folder=out_b, num_steps=4) == 0

    regressor = build_demo_regressor(cfg)
    losses = RegressorLosses(dict(cfg["losses"]))

    def final_params(folder):
        tr = Trainer(
            regressor, losses, optim_cfg=dict(cfg["optim"]),
            checkpointer=Checkpointer(
                save_dir=os.path.join(folder, "checkpoints")),
        )
        tr.resume()
        assert int(tr.state.step) == 8
        return tr.state.params

    pa = final_params(out_a)
    pb = final_params(out_b)
    flat_a = jax.tree_util.tree_leaves(pa)
    flat_b = jax.tree_util.tree_leaves(pb)
    assert len(flat_a) == len(flat_b)
    for xa, xb in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))

"""Ingestion robustness: malformed inputs degrade to per-sample skips
with a logged warning (datasets) or a clean nonzero verdict (HBW
submission checker) — never a traceback.

Reference tolerances mirrored: the structures layer pads/masks missing
keypoint blocks (data/utils/keypoints.py:75-120), and the HBW checker
prints diagnostics and exits nonzero (hbw_evaluation/
test_submission_format.py:4-43)."""

import json
import os

import numpy as np
import pytest


def _good_person(n_body=25):
    rng = np.random.default_rng(0)
    kp = np.zeros((n_body, 3), np.float32)
    kp[:, 0] = rng.uniform(30, 70, n_body)
    kp[:, 1] = rng.uniform(20, 90, n_body)
    kp[:, 2] = 0.9
    return {"pose_keypoints_2d": [float(v) for v in kp.reshape(-1)]}


def _write_img(path, rng, size=96):
    import cv2

    cv2.imwrite(str(path),
                (rng.uniform(size=(size, size, 3)) * 255).astype(np.uint8))


@pytest.fixture()
def openpose_root(tmp_path, rng):
    """images/ + keypoints/ with one good sample and four broken ones."""
    img_dir = tmp_path / "images"
    kp_dir = tmp_path / "keypoints"
    os.makedirs(img_dir)
    os.makedirs(kp_dir)

    # 1. fully valid
    _write_img(img_dir / "good.jpg", rng)
    (kp_dir / "good_keypoints.json").write_text(
        json.dumps({"people": [_good_person()]}))
    # 2. invalid JSON syntax
    _write_img(img_dir / "badjson.jpg", rng)
    (kp_dir / "badjson_keypoints.json").write_text("{not valid json!!")
    # 3. zero people
    _write_img(img_dir / "empty.jpg", rng)
    (kp_dir / "empty_keypoints.json").write_text(
        json.dumps({"people": []}))
    # 4. person with a mis-shaped keypoint block + one valid person
    _write_img(img_dir / "badperson.jpg", rng)
    (kp_dir / "badperson_keypoints.json").write_text(json.dumps({
        "people": [{"pose_keypoints_2d": [1.0, 2.0, 0.5]},
                   _good_person()],
    }))
    # 5. truncated image file with a valid JSON
    (img_dir / "truncated.jpg").write_bytes(b"\xff\xd8\xff\xe0JUNK")
    (kp_dir / "truncated_keypoints.json").write_text(
        json.dumps({"people": [_good_person()]}))
    return str(tmp_path)


def test_openpose_dataset_skips_malformed(openpose_root):
    """Failure modes 1-5: only the parseable person-samples survive, the
    broken ones are skipped (each with a logged warning — the repo
    logger does not propagate to caplog, so behaviour is asserted and
    the warnings are visible in the run log), and iteration never
    raises."""
    from shapy_tpu.data.datasets.openpose import OpenPoseDataset

    ds = OpenPoseDataset(data_folder=openpose_root,
                         img_folder="images",
                         keyp_folder="keypoints")
    # good.jpg (1 person) + badperson.jpg (1 valid of 2) +
    # truncated.jpg (1 person; image fails later, at __getitem__)
    assert len(ds) == 3
    samples = [ds[i] for i in range(len(ds))]
    kept = [s for s in samples if s is not None]
    # truncated.jpg's sample becomes None at read time
    assert len(kept) == 2
    assert {s["fname"] for s in kept} == {"good.jpg", "badperson.jpg"}


def test_openpose_loader_batches_skip_none(openpose_root):
    """The collate path drops the skipped samples: a full epoch yields
    only the valid rows, no crash."""
    from functools import partial

    from shapy_tpu.data.build import (
        DataLoader,
        SequentialBatchSampler,
        collate_batch,
    )
    from shapy_tpu.data.datasets.openpose import OpenPoseDataset
    from shapy_tpu.data.transforms import build_transforms

    ds = OpenPoseDataset(
        data_folder=openpose_root, img_folder="images",
        keyp_folder="keypoints",
        transforms=build_transforms({"crop_size": 32}, is_train=False),
    )
    loader = DataLoader(
        [ds], SequentialBatchSampler(len(ds), 3),
        collate_fn=partial(collate_batch), num_workers=1,
    )
    batches = [b for b in loader if b is not None]
    total = sum(b["images"].shape[0] for b in batches)
    assert total == 2


def test_parametric_dataset_skips_missing_image(tmp_path, rng):
    """A fits archive referencing a nonexistent/corrupt frame skips that
    row only."""
    from shapy_tpu.data.datasets.parametric import ParametricFitsDataset

    root = tmp_path / "fits"
    os.makedirs(root)
    _write_img(root / "ok.jpg", rng)
    (root / "broken.jpg").write_bytes(b"\x89PNGJUNK")
    np.savez(
        root / "fits.npz",
        imgname=np.asarray(["ok.jpg", "broken.jpg", "missing.jpg"]),
        center=np.full((3, 2), 48.0, np.float32),
        scale=np.full((3,), 0.5, np.float32),
        pose=np.zeros((3, 22, 3), np.float32),
    )
    ds = ParametricFitsDataset(data_folder=str(root),
                               npz_files=["fits.npz"],
                               keypoint_format="smplx")
    samples = [ds[i] for i in range(len(ds))]
    assert samples[0] is not None
    assert samples[1] is None and samples[2] is None


def test_hbw_checker_clean_failures(tmp_path, capsys):
    """Submission checker: corrupt file, missing keys, wrong vertex
    count, length mismatch — diagnostic + False each time, no
    traceback (reference test_submission_format.py:4-43)."""
    from shapy_tpu.cli.evaluate_hbw import check_submission_format

    # corrupt npz
    bad = tmp_path / "corrupt.npz"
    bad.write_bytes(b"not an npz at all")
    assert check_submission_format(str(bad)) is False
    assert "Cannot read" in capsys.readouterr().out

    # missing file
    assert check_submission_format(str(tmp_path / "nope.npz")) is False

    # truncated zip: starts with the PK magic so np.load reaches
    # zipfile, which raises BadZipFile (not OSError/ValueError) — the
    # checker must still print the diagnostic instead of tracebacking
    whole = tmp_path / "whole.npz"
    np.savez(whole, image_name=np.asarray(["a"]),
             v_shaped=np.zeros((1, 10475, 3), np.float32))
    cut = tmp_path / "truncated.npz"
    cut.write_bytes(whole.read_bytes()[:200])
    assert check_submission_format(str(cut)) is False
    assert "Cannot read" in capsys.readouterr().out

    # missing keys
    p = tmp_path / "missing_keys.npz"
    np.savez(p, something=np.zeros(3))
    assert check_submission_format(str(p)) is False
    assert "Missing required keys" in capsys.readouterr().out

    # wrong vertex count
    p = tmp_path / "wrong_v.npz"
    np.savez(p, image_name=np.asarray(["a", "b"]),
             v_shaped=np.zeros((2, 123, 3), np.float32))
    assert check_submission_format(str(p)) is False
    assert "v_shaped must be" in capsys.readouterr().out

    # length mismatch
    p = tmp_path / "len_mismatch.npz"
    np.savez(p, image_name=np.asarray(["a"]),
             v_shaped=np.zeros((2, 10475, 3), np.float32))
    assert check_submission_format(str(p)) is False
    assert "lengths differ" in capsys.readouterr().out

    # and a valid submission still passes
    p = tmp_path / "ok.npz"
    np.savez(p, image_name=np.asarray(["a", "b"]),
             v_shaped=np.zeros((2, 10475, 3), np.float32))
    assert check_submission_format(str(p)) is True

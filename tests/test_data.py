import os

import numpy as np
import pytest

from shapy_tpu.data import keypoints as K
from shapy_tpu.data.bbox import bbox_to_center_scale, keyps_to_bbox
from shapy_tpu.data.crop import (
    crop_image,
    crop_to_image_affine,
    image_to_crop_affine,
    transform_points,
)
from shapy_tpu.data.openpose import read_openpose_json
from shapy_tpu.data.transforms import build_transforms

SAMPLES = "/root/reference/samples"


def test_keypoint_format_lengths():
    assert len(K.SMPL_NAMES) == 24
    assert len(K.SMPLH_NAMES) == 52
    # 55 joints + 51 landmarks + 17 contour
    assert len(K.SMPLX_NAMES) == 123
    assert len(K.OPENPOSE25_NAMES) == 135
    assert len(K.OPENPOSE19_NAMES) == 129
    # contour-free variant
    assert len(K.model_keypoint_names("smplx", use_face_contour=False)) == 106


def test_keypoint_names_spotcheck():
    assert K.SMPLX_NAMES[22] == "jaw"
    assert K.SMPLX_NAMES[25] == "left_index1"
    assert K.SMPLX_NAMES[55] == "right_eye_brow1"
    assert K.OPENPOSE25_NAMES[0] == "nose"
    assert K.OPENPOSE25_NAMES[8] == "pelvis"
    assert K.OPENPOSE25_NAMES[19] == "left_big_toe"
    assert K.OPENPOSE25_NAMES[25] == "left_wrist"
    assert K.OPENPOSE25_NAMES[-1] == "right_lip_3"


def test_mapping_openpose_to_smplx():
    src_idx, dst_idx = K.keypoint_mapping("openpose25_v1", "smplx")
    # Every mapped name must match
    for s, d in zip(src_idx, dst_idx):
        assert K.OPENPOSE25_NAMES[s] == K.SMPLX_NAMES[d]
    # Common body joints are present
    mapped_names = {K.SMPLX_NAMES[d] for d in dst_idx}
    for name in ("pelvis", "left_wrist", "nose_middle", "left_contour_3"):
        assert name in mapped_names


def test_flip_permutation_involution():
    perm = K.flip_permutation("openpose25_v1")
    np.testing.assert_array_equal(perm[perm], np.arange(len(perm)))
    names = K.OPENPOSE25_NAMES
    i = names.index("left_wrist")
    assert names[perm[i]] == "right_wrist"


def test_part_idxs():
    parts = K.get_part_idxs("openpose25_v1")
    names = K.OPENPOSE25_NAMES
    for i in parts["left_hand"]:
        assert names[i].startswith("left")
    # 68 facial points + the neck (reference KEYPOINT_PARTS assigns neck
    # to the face part as well, keypoint_names.py:34)
    assert len(parts["face"]) == 69
    assert len(parts["body"]) > 20


def test_bbox_roundtrip():
    kp = np.asarray([[10.0, 20], [110, 220], [60, 120], [30, 40],
                     [50, 60], [70, 80]])
    conf = np.ones(6)
    bbox = keyps_to_bbox(kp, conf)
    center, scale, size = bbox_to_center_scale(bbox)
    np.testing.assert_allclose(center, [60, 120])
    assert size == pytest.approx(200.0)
    assert scale == pytest.approx(1.0)


def test_crop_affine_consistency():
    A = crop_to_image_affine([128, 90], 1.5, (256, 256))
    Ainv = image_to_crop_affine([128, 90], 1.5, (256, 256))
    np.testing.assert_allclose(A @ Ainv, np.eye(3), atol=1e-9)
    # centre of crop maps to the bbox centre
    c = transform_points(np.asarray([[128.0, 128.0]]), A)
    np.testing.assert_allclose(c[0], [128, 90], atol=1e-6)


def test_crop_image_contents():
    img = np.zeros((100, 120, 3), np.float32)
    img[40:60, 50:70] = 1.0  # white square centred at (60, 50)
    out = crop_image(img, [60, 50], 0.2, (64, 64))  # 40px crop
    # centre should be white, corners dark
    assert out[32, 32, 0] > 0.9
    assert out[2, 2, 0] < 0.1


@pytest.mark.skipif(not os.path.exists(SAMPLES), reason="no samples")
def test_read_reference_openpose_sample():
    kps = read_openpose_json(os.path.join(SAMPLES, "openpose",
                                          "img_00.json"))
    assert kps is not None
    assert kps.shape[1:] == (135, 3)


@pytest.mark.skipif(not os.path.exists(SAMPLES), reason="no samples")
def test_openpose_dataset_end_to_end():
    from shapy_tpu.data.datasets import OpenPoseDataset

    tf = build_transforms({"crop_size": 256}, is_train=False,
                          return_full_imgs=True)
    ds = OpenPoseDataset(
        data_folder=SAMPLES, img_folder="images", keyp_folder="openpose",
        transforms=tf,
    )
    assert len(ds) >= 4
    sample = ds[0]
    assert sample["cropped_image"].shape == (256, 256, 3)
    # normalised image: roughly zero-mean
    assert abs(float(sample["cropped_image"].mean())) < 3.0
    kp = sample["cropped_keypoints2d"]
    valid = kp[kp[:, 2] > 0]
    # valid keypoints should mostly land inside the crop
    frac_inside = np.mean(
        (valid[:, 0] > -20) & (valid[:, 0] < 276)
        & (valid[:, 1] > -20) & (valid[:, 1] < 276)
    )
    assert frac_inside > 0.9


def test_train_transforms_run():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(300, 400, 3)).astype(np.float32)
    kp = np.zeros((135, 3), np.float32)
    kp[:25, 0] = rng.uniform(100, 300, 25)
    kp[:25, 1] = rng.uniform(50, 250, 25)
    kp[:25, 2] = 1.0
    tf = build_transforms(
        {
            "crop_size": 128, "flip_prob": 0.5, "scale_factor": 0.25,
            "rotation_factor": 30.0, "noise_scale": 0.2,
            "center_jitter_factor": 0.1, "extreme_crop_prob": 0.3,
            "motion_blur_prob": 0.5,
        },
        is_train=True,
    )
    for seed in range(5):
        sample = {
            "image": img.copy(),
            "keypoints2d": kp.copy(),
            "center": np.asarray([200.0, 150.0]),
            "scale": 1.2,
        }
        out = tf(sample, np.random.default_rng(seed))
        assert out["cropped_image"].shape == (128, 128, 3)
        assert np.isfinite(out["cropped_image"]).all()


def test_parametric_dataset_native_sources():
    """EHF/SPIN/SPINX/H36MX fits remap from their own native keypoint
    orderings, not a hardcoded openpose25_v1 (reference registry)."""
    from shapy_tpu.data.datasets.parametric import (
        PARAMETRIC_SOURCES,
        ParametricFitsDataset,
    )

    assert PARAMETRIC_SOURCES["ehf"] == "ehf"
    assert PARAMETRIC_SOURCES["spinx"] == "spinx"
    for name, fmt in PARAMETRIC_SOURCES.items():
        assert fmt in K.KEYPOINT_NAMES_DICT, (name, fmt)
        ds = ParametricFitsDataset(dataset_name=name)
        assert ds.keypoint_format == fmt
    # explicit override wins
    ds = ParametricFitsDataset(dataset_name="spin",
                               keypoint_format="openpose25_v1")
    assert ds.keypoint_format == "openpose25_v1"


def test_remap_roundtrip_all_reference_formats(rng):
    """map_keypoints zero-fills missing names and preserves shared names
    for every format in the registry (remapped into smplx order)."""
    for fmt, names in K.KEYPOINT_NAMES_DICT.items():
        kp = rng.normal(size=(1, len(names), 3)).astype(np.float32)
        out, _ = K.map_keypoints(kp, fmt, "smplx")
        src_idx, dst_idx = K.keypoint_mapping(fmt, "smplx")
        assert out.shape[1] == len(K.KEYPOINT_NAMES_DICT["smplx"])
        if len(src_idx):
            np.testing.assert_array_equal(
                out[:, dst_idx], kp[:, src_idx]
            )
        # untouched rows are zero
        mask = np.ones(out.shape[1], bool)
        mask[dst_idx] = False
        assert np.all(out[:, mask] == 0)


def test_vertex_flipper_mirror_symmetric_mesh():
    """On a mirror-symmetric template, template-derived correspondences
    make flipping exact: flip(v) == mirror(v) re-indexed to the
    symmetric partner (reference ssp3d.py:84-94 semantics)."""
    from shapy_tpu.data.transforms import VertexFlipper
    from shapy_tpu.models.body.assets import icosphere

    v, f = icosphere(2)
    v = v * np.array([0.3, 0.8, 0.25])
    flipper = VertexFlipper.from_template(v)

    flipped = flipper(v.astype(np.float32))
    # Flipping a perfectly mirror-symmetric body is the identity: vertex
    # i resamples the x-negated surface at its mirror partner, landing
    # back on its own position (reference vertices.py:47-53 semantics).
    np.testing.assert_allclose(flipped, v.astype(np.float32), atol=1e-6)

    # And an asymmetric deformation travels to the other side.
    v2 = v.copy()
    bump = (v[:, 0] > 0.1) & (v[:, 1] > 0.2)
    v2[bump] *= 1.05
    flipped2 = flipper(v2.astype(np.float32))
    assert np.abs(flipped2[:, 0].min() - (-v2[:, 0].max())) < 1e-5


def test_horizontal_flip_flips_gt_vertices(rng):
    from shapy_tpu.data.transforms import (
        RandomHorizontalFlip,
        VertexFlipper,
    )
    from shapy_tpu.models.body.assets import icosphere

    v, f = icosphere(2)
    flipper = VertexFlipper.from_template(v)
    tf = RandomHorizontalFlip(prob=1.0, vertex_flipper=flipper)
    sample = {
        "image": np.zeros((8, 8, 3), np.float32),
        "center": np.array([4.0, 4.0]),
        "gt_vertices": v.astype(np.float32),
    }
    out = tf(sample, np.random.default_rng(0))
    assert out["is_flipped"]
    # Symmetric mesh: vertex flip is the identity (content exchanged
    # between symmetric partners, positions preserved).
    np.testing.assert_allclose(out["gt_vertices"], v.astype(np.float32),
                               atol=1e-6)


def test_flip_pose_and_joints3d_consistency():
    from shapy_tpu.data.keypoints import (
        flip_pose_aa,
        pose_flip_permutation,
    )
    from shapy_tpu.data.transforms import RandomHorizontalFlip

    rng = np.random.default_rng(9)
    # involution: flipping twice restores the pose exactly
    for j in (22, 24, 55):
        pose = rng.normal(size=(j, 3)).astype(np.float32)
        np.testing.assert_allclose(
            flip_pose_aa(flip_pose_aa(pose)), pose, atol=1e-7)
    # pelvis (no partner) keeps its x component, mirrors y/z
    pose = rng.normal(size=(24, 3)).astype(np.float32)
    f = flip_pose_aa(pose)
    perm = pose_flip_permutation(24)
    assert perm[0] == 0
    np.testing.assert_allclose(f[0, 0], pose[0, 0])
    np.testing.assert_allclose(f[0, 1:], -pose[0, 1:])

    # joints3d + pose + keypoints2d all flip together in the transform
    from shapy_tpu.data.keypoints import KEYPOINT_NAMES_DICT

    tf = RandomHorizontalFlip(prob=1.0, fmt="openpose25_v1")
    n = len(KEYPOINT_NAMES_DICT["openpose25_v1"])
    sample = {
        "image": np.zeros((8, 8, 3), np.float32),
        "center": np.array([4.0, 4.0]),
        "keypoints2d": rng.normal(size=(n, 3)).astype(np.float32),
        "joints3d": rng.normal(size=(n, 4)).astype(np.float32),
        "gt_pose_aa": rng.normal(size=(55, 3)).astype(np.float32),
    }
    before_j3d = sample["joints3d"].copy()
    out = tf(dict(sample), np.random.default_rng(0))
    # x negated, rows permuted by the same format table as keypoints2d
    from shapy_tpu.data.keypoints import flip_permutation

    perm2d = flip_permutation("openpose25_v1")
    np.testing.assert_allclose(
        out["joints3d"][:, 0], -before_j3d[perm2d, 0], atol=1e-7)
    np.testing.assert_allclose(
        out["joints3d"][:, 1:], before_j3d[perm2d, 1:], atol=1e-7)
    assert not np.allclose(out["gt_pose_aa"], sample["gt_pose_aa"])


def test_collate_mixed_batches_and_3d_targets():
    """collate_batch with heterogeneous samples: no key may be dropped
    because the FIRST sample lacks it, none may crash because a LATER
    one does; 3D joints remap by name and axis-angle poses become
    rotation-matrix targets."""
    from shapy_tpu.data.build import collate_batch
    from shapy_tpu.data.keypoints import KEYPOINT_NAMES_DICT

    rng = np.random.default_rng(5)
    target_names = tuple(KEYPOINT_NAMES_DICT["spin"])  # 24 GT names
    img = np.zeros((8, 8, 3), np.float32)

    with_gt = {
        "cropped_image": img,
        "keypoint_format": "spin",
        "gt_betas": rng.normal(size=10).astype(np.float32),
        "gt_vertices": rng.normal(size=(12, 3)).astype(np.float32),
        "joints3d": rng.normal(size=(24, 4)).astype(np.float32),
        "gt_pose_aa": rng.normal(size=(24, 3)).astype(np.float32) * 0.3,
    }
    without = {"cropped_image": img, "keypoint_format": "spin"}

    # GT only in the SECOND sample: keys must still be collated
    out = collate_batch([without, with_gt],
                        target_keypoint_names=target_names)
    assert out["gt_betas_valid"].tolist() == [0.0, 1.0]
    assert out["gt_vertices_valid"].tolist() == [0.0, 1.0]
    assert out["gt_pose_valid"].tolist() == [0.0, 1.0]
    assert out["joints3d"].shape == (2, len(target_names), 4)
    # sample 0 contributes zero confidence everywhere
    np.testing.assert_allclose(out["joints3d"][0, :, 3], 0.0)
    # sample 1's joints3d arrive under the right names (identity map)
    np.testing.assert_allclose(out["joints3d"][1], with_gt["joints3d"])

    # rotation targets are valid rotation matrices
    R = out["gt_body_pose"][1]
    np.testing.assert_allclose(
        R @ np.transpose(R, (0, 2, 1)),
        np.tile(np.eye(3, dtype=np.float32), (21, 1, 1)),
        atol=1e-5,
    )
    # GT only in the FIRST sample: must not crash on the second
    out = collate_batch([with_gt, without],
                        target_keypoint_names=target_names)
    assert out["gt_betas_valid"].tolist() == [1.0, 0.0]

import json
import os

import numpy as np
import pytest
import yaml

from shapy_tpu.data.build import (
    DataLoader,
    SequentialBatchSampler,
    build_all_data_loaders,
    collate_batch,
)
from shapy_tpu.data.samplers import (
    EqualSampler,
    ShapeSampler,
    weights_to_probabilities,
)
from shapy_tpu.data.transforms import build_transforms


def write_img(path, H=120, W=100):
    import cv2

    rng = np.random.default_rng(0)
    img = (rng.uniform(size=(H, W, 3)) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, img)


def fake_openpose_person(rng, W=100, H=120):
    body = np.zeros((25, 3))
    body[:, 0] = rng.uniform(20, 80, 25)
    body[:, 1] = rng.uniform(20, 100, 25)
    body[:, 2] = 0.9
    return {
        "pose_keypoints_2d": body.reshape(-1).tolist(),
        "hand_left_keypoints_2d": [],
        "hand_right_keypoints_2d": [],
        "face_keypoints_2d": [],
    }


@pytest.fixture()
def hbw_root(tmp_path, rng):
    root = tmp_path / "hbw"
    # subject with images + keypoints + gt mesh
    img_dir = root / "photos" / "val" / "s001_case"
    kp_dir = root / "keypoints" / "val" / "s001_case"
    mesh_dir = root / "v_templates" / "smplx" / "val"
    for t in ("studio",):
        write_img(str(img_dir / t / "img0.jpg"))
        os.makedirs(kp_dir / t, exist_ok=True)
        with open(kp_dir / t / "img0.json", "w") as f:
            json.dump({"people": [fake_openpose_person(rng)]}, f)
    os.makedirs(mesh_dir, exist_ok=True)
    from shapy_tpu.models.body.assets import icosphere

    verts, faces = icosphere(1)
    with open(mesh_dir / "s001.obj", "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for tri in faces + 1:
            f.write(f"f {tri[0]} {tri[1]} {tri[2]}\n")
    with open(root / "genders.yaml", "w") as f:
        yaml.safe_dump({"s001": "female"}, f)
    return str(root), faces


def test_hbw_dataset(hbw_root, rng):
    from shapy_tpu.data.datasets.hbw import HBWDataset
    from shapy_tpu.measure import BodyMeasurements, MeasurementAnchors
    from shapy_tpu.models.body.assets import icosphere

    root, faces = hbw_root
    verts, _ = icosphere(1)
    anchors = MeasurementAnchors.synthetic(faces, verts)
    meas = BodyMeasurements(anchors=anchors, num_hull_directions=64)

    tf = build_transforms({"crop_size": 64}, is_train=False)
    ds = HBWDataset(
        data_folder=root, split="val", transforms=tf,
        measurements_module=meas, body_model_faces=faces,
    )
    assert len(ds) == 1
    s = ds[0]
    assert s["gender"] == "female"
    assert s["gender_int"] == 2
    assert s["gt_v_shaped"].shape == (42, 3)
    assert "height_gt" in s and s["height_gt"] > 0
    assert s["cropped_image"].shape == (64, 64, 3)
    # measurement cache written
    assert os.path.exists(os.path.join(root, "_meas_cache_val.npz"))
    # second construction uses the cache
    ds2 = HBWDataset(
        data_folder=root, split="val", transforms=tf,
        measurements_module=meas, body_model_faces=faces,
    )
    assert ds2.gt_measurements["s001"]["height"] == pytest.approx(
        ds.gt_measurements["s001"]["height"]
    )


@pytest.fixture()
def agency_root(tmp_path, rng):
    root = tmp_path / "agency"
    write_img(str(root / "acme" / "images" / "m1" / "a.jpg"))
    body = np.zeros((135, 3))
    body[:25, 0] = rng.uniform(20, 80, 25)
    body[:25, 1] = rng.uniform(20, 100, 25)
    body[:25, 2] = 0.9
    annotations = {
        "m1": {
            "agency": "acme",
            "gender": "female",
            "height": 1.74,
            "chest": 0.86,
            "waist": 0.62,
            "hips": 0.9,
            "attributes": list(np.linspace(1, 5, 15)),
            "images": {"a.jpg": body.tolist()},
        }
    }
    with open(root / "annotations.json", "w") as f:
        json.dump(annotations, f)
    with open(root / "splits.json", "w") as f:
        json.dump({"train": ["m1"], "val": [], "test": []}, f)
    return str(root)


def test_model_agency_dataset(agency_root):
    from shapy_tpu.data.datasets.model_agencies import ModelAgencyDataset

    tf = build_transforms({"crop_size": 64}, is_train=False)
    ds = ModelAgencyDataset(data_folder=agency_root, split="train",
                            transforms=tf)
    assert len(ds) == 1
    s = ds[0]
    assert s["height"] == pytest.approx(1.74)
    assert s["attributes"].shape == (15,)
    assert s["height_valid"] == 1.0


def test_ssp3d_dataset(tmp_path, rng):
    from shapy_tpu.data.datasets.ssp3d import SSP3DDataset

    root = tmp_path / "ssp"
    write_img(str(root / "images" / "f0.png"))
    kp = np.zeros((25, 3))
    kp[:, 0] = rng.uniform(20, 80, 25)
    kp[:, 1] = rng.uniform(20, 100, 25)
    kp[:, 2] = 1.0
    np.savez(
        root / "labels.npz",
        fnames=["f0.png"],
        shapes=rng.normal(size=(1, 10)),
        poses=rng.normal(size=(1, 72)) * 0.1,
        joints2D=kp[None],
        genders=["m"],
        bbox_centres=np.asarray([[50.0, 60.0]]),
        bbox_whs=np.asarray([60.0]),
        cam_trans=np.zeros((1, 3)),
    )
    tf = build_transforms({"crop_size": 64}, is_train=False)
    ds = SSP3DDataset(data_folder=str(root), transforms=tf)
    s = ds[0]
    assert s["gt_betas"].shape == (10,)
    assert s["gender_int"] == 1
    assert s["cropped_image"].shape == (64, 64, 3)


def test_samplers(rng):
    class FakeDS:
        def __init__(self, n, only2d, name, genders=None, weight=None):
            self.n, self._only2d, self._name = n, only2d, name
            self.gender = np.asarray(genders or ["m"] * n)
            self.weight = np.asarray(weight if weight is not None
                                     else np.ones(n))

        def __len__(self):
            return self.n

        def only_2d(self):
            return self._only2d

        def name(self):
            return self._name

    a, b = FakeDS(10, True, "a"), FakeDS(6, False, "b")
    sampler = EqualSampler([a, b], batch_size=4, ratio_2d=0.5,
                           shuffle=True)
    batches = list(sampler)
    assert len(batches) == 4
    for batch in batches:
        assert len(batch) == 4
        n_2d = np.sum(batch < 10)
        assert n_2d <= 2

    c = FakeDS(
        40, True, "c",
        genders=["m"] * 20 + ["f"] * 20,
        weight=np.concatenate([np.full(20, 60.0), np.full(20, 90.0)]),
    )
    shape_sampler = ShapeSampler([c], batch_size=8, shuffle=False)
    batch = next(iter(shape_sampler))
    genders = c.gender[batch]
    assert (genders == "m").sum() == 4  # balanced

    probs = weights_to_probabilities(np.asarray([60.0] * 9 + [100.0]))
    assert probs[-1] > probs[0]  # rare value upweighted


def test_collate_and_loader(rng):
    from shapy_tpu.data.keypoints import model_keypoint_names

    names = model_keypoint_names("smplx", use_face_contour=False)

    samples = []
    for i in range(3):
        kp = np.zeros((135, 3), np.float32)
        kp[:25, :2] = rng.uniform(-1, 1, (25, 2))
        kp[:25, 2] = 1.0
        samples.append(
            {
                "cropped_image": np.zeros((32, 32, 3), np.float32),
                "target_keypoints2d": kp,
                "keypoint_format": "openpose25_v1",
                "fname": f"img{i}.jpg",
                "gender": "male",
                "gender_int": 1,
                "height": 1.7,
                "gt_betas": rng.normal(size=5).astype(np.float32),
            }
        )
    batch = collate_batch(samples, target_keypoint_names=names)
    assert batch["images"].shape == (3, 32, 32, 3)
    assert batch["target_keypoints2d"].shape == (3, len(names), 3)
    # pelvis got mapped from openpose index 8
    pel = names.index("pelvis")
    np.testing.assert_allclose(
        batch["target_keypoints2d"][0, pel],
        samples[0]["target_keypoints2d"][8],
    )
    assert batch["gt_betas"].shape == (3, 10)
    assert batch["gt_betas_valid"].sum() == 3
    assert batch["height"].shape == (3,)

    class ListDS:
        def __init__(self, items):
            self.items = items

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return self.items[i]

        def only_2d(self):
            return True

        def name(self):
            return "list"

    loader = DataLoader(
        [ListDS(samples)],
        SequentialBatchSampler(3, 2),
        lambda s: collate_batch(s, target_keypoint_names=names),
        num_workers=2,
    )
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["images"].shape[0] == 2
    assert batches[1]["images"].shape[0] == 1


def test_build_all_data_loaders_openpose(rng):
    cfg = {
        "datasets": {
            "batch_size": 4,
            "pose_shape_ratio": 1.0,
            "pose": {
                "splits": {"test": ["openpose"]},
                "transforms": {"crop_size": 64},
                "openpose": {
                    "data_folder": "/root/reference/samples",
                    "img_folder": "images",
                    "keyp_folder": "openpose",
                },
            },
        }
    }
    loaders = build_all_data_loaders(cfg, split="test")
    assert "pose" in loaders
    batch = next(iter(loaders["pose"]))
    assert batch["images"].shape == (4, 64, 64, 3)


def test_openpose_tracks_dataset():
    from shapy_tpu.data.datasets.openpose_tracks import (
        OpenPoseTracksDataset,
    )

    ds = OpenPoseTracksDataset(
        data_folder="/root/reference/samples",
        img_folder="images",
        keyp_folder="openpose",
    )
    assert len(ds) == 22
    sample = ds[0]
    assert "track_id" in sample
    tracks = ds.tracks()
    assert sum(len(v) for v in tracks.values()) == len(ds)


def test_sharded_sampler_partitions_batches():
    """Two shards of the same sampler cover each global batch exactly
    once, disjointly (multi-host input pipeline)."""
    from shapy_tpu.data.samplers import ShardedSampler
    from shapy_tpu.data.build import SequentialBatchSampler

    base = SequentialBatchSampler(32, 8, drop_last=True)
    s0 = ShardedSampler(SequentialBatchSampler(32, 8, drop_last=True),
                        num_shards=2, shard_id=0)
    s1 = ShardedSampler(SequentialBatchSampler(32, 8, drop_last=True),
                        num_shards=2, shard_id=1)
    for full, a, b in zip(iter(base), iter(s0), iter(s1)):
        assert len(a) == len(b) == 4
        merged = sorted(np.concatenate([a, b]).tolist())
        assert merged == sorted(np.asarray(full).tolist())


def test_shard_sampler_by_process_single_host_noop():
    from shapy_tpu.data.samplers import shard_sampler_by_process
    from shapy_tpu.data.build import SequentialBatchSampler

    s = SequentialBatchSampler(16, 4)
    assert shard_sampler_by_process(s) is s


def test_parametric_multi_archive_field_alignment(tmp_path, rng):
    """Fields present in only SOME npz archives must stay row-aligned:
    archive A (no joints3d) + archive B (joints3d) — A's samples carry
    no joints3d, B's carry THEIR OWN rows (naive per-field concat would
    serve B's joints3d for A's images and crash on the tail)."""
    import cv2

    from shapy_tpu.data.datasets.parametric import ParametricFitsDataset

    img_dir = tmp_path
    for i in range(4):
        cv2.imwrite(str(tmp_path / f"im{i}.jpg"),
                    (rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8))

    def write(fname, names, with_j3d):
        n = len(names)
        kw = dict(
            imgname=np.asarray(names),
            center=np.full((n, 2), 32.0, np.float32),
            scale=np.full((n,), 0.5, np.float32),
            pose=np.zeros((n, 22, 3), np.float32),
            keypoints2d=np.zeros((n, 49, 3), np.float32),
        )
        if with_j3d:
            kw["joints3d"] = np.arange(n, dtype=np.float32).reshape(
                n, 1, 1).repeat(24, 1).repeat(4, 2) + 100.0
        np.savez(tmp_path / fname, **kw)

    write("a.npz", ["im0.jpg", "im1.jpg"], with_j3d=False)
    write("b.npz", ["im2.jpg", "im3.jpg"], with_j3d=True)

    ds = ParametricFitsDataset(
        data_folder=str(img_dir), npz_files=["a.npz", "b.npz"],
        keypoint_format="spin49", split="train", transforms=None,
    )
    assert len(ds) == 4
    assert "joints3d" not in ds[0] and "joints3d" not in ds[1]
    # B's first row (global index 2) carries B's OWN joints3d (value 100)
    np.testing.assert_allclose(ds[2]["joints3d"][0, 0], 100.0)
    np.testing.assert_allclose(ds[3]["joints3d"][0, 0], 101.0)


def test_crop_rotation_rotates_3d_supervision(rng):
    """Rotation augmentation must rotate camera-frame 3D GT (joints3d,
    gt_vertices, global orient of gt_pose_aa) by R_z(-rot) like the
    reference structures (keypoints.py:432, vertices.py:85,
    global_rot.py:54)."""
    import cv2

    from shapy_tpu.data.transforms import Crop

    rot = 90.0
    sample = {
        "image": (rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8),
        "center": np.asarray([32.0, 32.0]),
        "scale": 0.5,
        "rotation": rot,
        "joints3d": np.asarray([[1.0, 0.0, 2.0, 1.0]], np.float32),
        "gt_vertices": np.asarray([[1.0, 0.0, 2.0]], np.float32),
        "gt_pose_aa": np.zeros((22, 3), np.float32),
    }
    out = Crop(crop_size=32, is_train=True)(
        dict(sample), np.random.default_rng(0))
    # R_z(-90deg) @ (1, 0, z) = (0, -1, z)
    np.testing.assert_allclose(
        out["joints3d"][0, :3], [0.0, -1.0, 2.0], atol=1e-6)
    np.testing.assert_allclose(
        out["gt_vertices"][0], [0.0, -1.0, 2.0], atol=1e-6)
    # identity global orient -> axis-angle of R_z(-90deg)
    aa_global = out["gt_pose_aa"][0]
    R_expected = cv2.Rodrigues(aa_global.astype(np.float64))[0]
    c, s = np.cos(np.deg2rad(-rot)), np.sin(np.deg2rad(-rot))
    np.testing.assert_allclose(
        R_expected, [[c, -s, 0], [s, c, 0], [0, 0, 1]], atol=1e-6)
    # body rows untouched
    np.testing.assert_allclose(out["gt_pose_aa"][1:], 0.0)


def test_shape_sampler_reads_item_metadata():
    """ShapeSampler must read weight/bmi/gender from per-item metadata
    dicts (ModelAgencyDataset stores them on .items, not as dataset
    arrays) — use_shape_sampling previously crashed with AttributeError."""
    from shapy_tpu.data.samplers import ShapeSampler

    class ItemsDS:
        def __init__(self):
            self.items = [
                {"weight": 55.0, "height": 1.65, "gender": "female"},
                {"weight": 80.0, "height": 1.85, "gender": "male"},
                {"weight": None, "height": 1.7, "gender": "male"},
                {"weight": 62.0, "height": 1.7, "gender": "female"},
            ]

        def __len__(self):
            return len(self.items)

    for key in ("weight", "bmi"):
        s = ShapeSampler([ItemsDS()], batch_size=4, importance_key=key)
        batches = list(iter(s))
        assert batches and all(b.shape == (4,) for b in batches)
        assert set(np.concatenate(batches)) <= {0, 1, 2, 3}

"""OpenPose-keypoints demo dataset: images + OpenPose JSONs, no labels.

Behavioural spec: reference ``regressor/human_shape/data/datasets/
openpose.py:34-247``: one item per detected person, keypoints in
``openpose25_v1`` format, per-part confidence thresholding/binarisation,
bbox from valid keypoints with ``body_dset_factor`` padding, and crop
metadata for the downstream transforms.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from shapy_tpu.data.bbox import bbox_to_center_scale, keyps_to_bbox
from shapy_tpu.data.openpose import read_openpose_json, threshold_and_keep_parts


def read_img(path: str, dtype: str = "float32") -> np.ndarray:
    """RGB float32 [0, 1], or raw uint8 with ``dtype='uint8'`` — the
    input format for the fused on-device decode+crop+normalize path
    (``BodyRegressor.apply_from_full_images``), which keeps the
    host->device transfer 4x smaller and moves the float conversion to
    the TPU."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if dtype == "uint8":
        return img
    out = img.astype(np.float32)
    np.divide(out, 255.0, out=out)  # in-place: skip one full-image pass
    return out


class OpenPoseDataset:
    SOURCE = "openpose25_v1"

    def __init__(
        self,
        data_folder: str = "data/openpose",
        img_folder: str = "images",
        keyp_folder: str = "keypoints",
        split: str = "test",
        transforms=None,
        body_thresh: float = 0.1,
        hand_thresh: float = 0.2,
        face_thresh: float = 0.4,
        body_dset_factor: float = 1.2,
        binarization: bool = True,
        image_dtype: str = "float32",
        **kwargs,
    ):
        self.image_dtype = image_dtype
        self.data_folder = os.path.expanduser(os.path.expandvars(data_folder))
        self.img_folder = os.path.join(self.data_folder, img_folder)
        self.keyp_folder = os.path.join(self.data_folder, keyp_folder)
        self.transforms = transforms
        self.body_thresh = body_thresh
        self.hand_thresh = hand_thresh
        self.face_thresh = face_thresh
        self.body_dset_factor = body_dset_factor
        self.binarization = binarization
        self.is_train = "train" in split

        self.img_paths: List[str] = []
        keypoints = []
        for img_fname in sorted(os.listdir(self.img_folder)):
            fname = os.path.splitext(img_fname)[0]
            keyp_path = os.path.join(self.keyp_folder,
                                     f"{fname}_keypoints.json")
            if not os.path.exists(keyp_path):
                keyp_path = os.path.join(self.keyp_folder, f"{fname}.json")
                if not os.path.exists(keyp_path):
                    continue
            kps = read_openpose_json(keyp_path)
            if kps is None:
                continue
            self.img_paths += [
                os.path.join(self.img_folder, img_fname)
            ] * kps.shape[0]
            keypoints.append(kps)
        self.keypoints = (
            np.concatenate(keypoints, axis=0) if keypoints
            else np.zeros((0, 135, 3), np.float32)
        )

    def __len__(self) -> int:
        return len(self.img_paths)

    def only_2d(self) -> bool:
        return True

    def __getitem__(self, index: int) -> Optional[Dict]:
        img_path = self.img_paths[index]
        try:
            img = read_img(img_path, self.image_dtype)
        except (FileNotFoundError, OSError, ValueError) as exc:
            # Truncated/corrupt image: skip the sample with a warning
            # (collate_batch drops None rows) instead of killing the run.
            from shapy_tpu.utils.logging import get_logger

            get_logger(__name__).warning(
                "Skipping unreadable image %s: %s", img_path, exc)
            return None

        kp = np.array(self.keypoints[index], copy=True)
        kp[:, -1] = np.clip(kp[:, -1], 0, 1)
        kp = threshold_and_keep_parts(
            kp, self.SOURCE, self.body_thresh, self.hand_thresh,
            self.face_thresh, self.binarization,
        )

        bbox = keyps_to_bbox(kp[:, :2], kp[:, 2], img_size=img.shape)
        center, scale, bbox_size = bbox_to_center_scale(
            bbox, dset_scale_factor=self.body_dset_factor
        )
        if center is None:
            return None

        sample: Dict = {
            "image": img,
            "keypoints2d": kp,
            "keypoint_format": self.SOURCE,
            "center": center,
            "scale": scale,
            "bbox_size": bbox_size,
            "orig_center": center.copy(),
            "orig_bbox_size": bbox_size,
            "fname": os.path.basename(img_path),
            "index": index,
        }
        if self.transforms is not None:
            from shapy_tpu.data.rng import augment_rng

            rng = augment_rng(index, self.is_train)
            sample = self.transforms(sample, rng)
        return sample

"""OpenPose JSON keypoint reading and confidence processing.

Behavioural spec: reference ``regressor/human_shape/data/utils/
keypoints.py:10-120``: per person, concatenate body (25) + left hand (21)
+ right hand (21) + face (70 minus the 2 pupil points) keypoints into a
135 x 3 array in the ``openpose25_v1`` format, then threshold/binarise
part confidences.
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np

from shapy_tpu.data.keypoints import get_part_idxs


def read_openpose_json(path: str) -> Optional[np.ndarray]:
    """-> (num_people, 135, 3) [x, y, conf] or None when no people."""
    with open(path) as f:
        data = json.load(f)

    people = []
    for person in data.get("people", []):
        body = np.asarray(
            person["pose_keypoints_2d"], dtype=np.float32
        ).reshape(-1, 3)
        parts = [body]
        for key, n in (
            ("hand_left_keypoints_2d", 21),
            ("hand_right_keypoints_2d", 21),
        ):
            vals = person.get(key, [])
            if len(vals) < 1:
                vals = [0.0] * (n * 3)
            parts.append(np.asarray(vals, dtype=np.float32).reshape(-1, 3))
        face = person.get("face_keypoints_2d", [])
        if len(face) < 1:
            face = [0.0] * (70 * 3)
        face = np.asarray(face, dtype=np.float32).reshape(-1, 3)
        parts.append(face[:-2])  # drop the two pupil points
        people.append(np.concatenate(parts, axis=0))

    if not people:
        return None
    return np.stack(people)


def binarize(conf: np.ndarray, thresh: float) -> np.ndarray:
    if thresh > 0:
        return (conf >= thresh).astype(conf.dtype)
    return (conf > 0).astype(conf.dtype)


def threshold_and_keep_parts(
    keypoints: np.ndarray,
    fmt: str = "openpose25_v1",
    body_thresh: float = 0.3,
    hand_thresh: float = 0.3,
    face_thresh: float = 0.4,
    binarization: bool = True,
) -> np.ndarray:
    """Zero out low-confidence part keypoints, optionally binarise
    confidences (reference keypoints.py:10-72)."""
    out = np.array(keypoints, copy=True)
    parts = get_part_idxs(fmt)
    groups = (
        (parts["body"], body_thresh),
        (parts["left_hand"], hand_thresh),
        (parts["right_hand"], hand_thresh),
        (parts["face"], face_thresh),
    )
    for idxs, thresh in groups:
        conf = out[..., idxs, -1]
        if thresh > 0:
            conf = np.where(conf < thresh, 0.0, conf)
        if binarization:
            conf = binarize(conf, thresh)
        out[..., idxs, -1] = conf
    return out

"""2D keypoint / skeleton / bbox drawing for image summaries.

Mirrors the reference's matplotlib-free cv2 helpers
(``regressor/human_shape/utils/plot_utils.py:84-236``: blend_images,
undo_img_normalization, keyp_target_to_image, create_skel_img,
create_bbox_img) on plain numpy arrays. The Evaluator logs a GT-keypoint
grid and an estimated-keypoint grid next to the mesh overlays, exactly
like the reference's ``evaluation.py:345-395`` summaries.

Colour semantics match the reference: left-side joints red, right-side
blue, everything else white; finger chains get a per-finger colour;
hand/face markers shrink (pair[1] >= 22 in the reference's 144-format —
here decided by name, which is format-independent).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

# per-finger colours (reference HAND_COLORS, plot_utils.py:33-41)
_FINGER_COLORS = {
    "thumb": (1.0, 0.4, 0.4),
    "index": (0.4, 1.0, 0.4),
    "middle": (0.4, 0.4, 1.0),
    "ring": (1.0, 1.0, 0.4),
    "pinky": (1.0, 0.4, 1.0),
}
_BODY_NAME_COUNT = 22  # joints beyond this are hand/face detail


def blend_images(img1: np.ndarray, img2: np.ndarray,
                 alpha: float = 0.7) -> np.ndarray:
    """Reference blend_images (plot_utils.py:84)."""
    return img1 * alpha + (1 - alpha) * img2


def undo_img_normalization(img: np.ndarray, mean, std) -> np.ndarray:
    """(H, W, 3) or (3, H, W) normalised crop -> [0, 1] HWC float image
    (reference undo_img_normalization, plot_utils.py:88-106)."""
    img = np.asarray(img, np.float32)
    if img.ndim == 3 and img.shape[0] == 3 and img.shape[-1] != 3:
        img = np.transpose(img, (1, 2, 0))
    mean = np.asarray(mean, np.float32).reshape(1, 1, -1)
    std = np.asarray(std, np.float32).reshape(1, 1, -1)
    return np.clip(img * std + mean, 0.0, 1.0)


def _joint_color(name: Optional[str], color_left, color_right, color_else):
    if not name:
        return color_else
    for finger, c in _FINGER_COLORS.items():
        if finger in name:
            return c
    if "left" in name:
        return color_left
    if "right" in name:
        return color_right
    return color_else


def create_skel_img(
    img: np.ndarray,
    keypoints: np.ndarray,
    connections: Sequence[Tuple[int, int]],
    valid: Optional[np.ndarray] = None,
    names: Optional[List[str]] = None,
    color_left=(0.9, 0.0, 0.0),
    color_right=(0.0, 0.0, 0.9),
    color_else=(1.0, 1.0, 1.0),
    marker_size: int = 2,
    linewidth: int = 2,
    draw_skel: bool = True,
    draw_text: bool = False,
) -> np.ndarray:
    """Draw a 2D skeleton over an image (reference create_skel_img,
    plot_utils.py:138-217: marker at each edge's END joint, AA line per
    valid edge, colour from the end joint's name).

    img: (H, W, 3) float [0, 1] (or CHW, transposed automatically);
    keypoints: (K, 2) pixel coords; valid: (K,) bool/0-1 mask.
    """
    import cv2

    kp_img = np.ascontiguousarray(undo_img_normalization(img, 0.0, 1.0))
    K = keypoints.shape[0]
    if valid is None:
        valid = np.ones(K, bool)
    valid = np.asarray(valid).reshape(-1) > 0

    for a, b in connections:
        if a >= K or b >= K or not (valid[a] and valid[b]):
            continue
        name_b = names[b] if names is not None and b < len(names) else None
        color = tuple(
            float(c)
            for c in _joint_color(name_b, color_left, color_right,
                                  color_else))
        body = name_b is None or not any(
            f in name_b for f in _FINGER_COLORS)
        m = marker_size if body else max(int(0.1 * marker_size), 1)
        center = tuple(int(round(v)) for v in keypoints[b, :2])
        cv2.circle(kp_img, center, m, color)
        if draw_skel:
            start = tuple(int(round(v)) for v in keypoints[a, :2])
            cv2.line(kp_img, start, center, color, thickness=linewidth,
                     lineType=cv2.LINE_AA)
        if draw_text and body:
            cv2.putText(kp_img, str(b), center, cv2.FONT_HERSHEY_PLAIN,
                        1.0, (0.0, 0.0, 0.0), 4)
            cv2.putText(kp_img, str(b), center, cv2.FONT_HERSHEY_PLAIN,
                        1.0, color, 2)
    return kp_img


def keyp_target_to_image(
    img: np.ndarray,
    keypoints: np.ndarray,
    fmt: str,
    draw_text: bool = False,
    **kwargs,
) -> np.ndarray:
    """GT-keypoint overlay from a (K, 3) [x, y, conf] target in the
    named registry format (reference keyp_target_to_image,
    plot_utils.py:108-135 — connections/names come from the format)."""
    from shapy_tpu.data.keypoints import (
        KEYPOINT_NAMES_DICT,
        kp_connections,
    )

    kp = np.asarray(keypoints, np.float32)
    return create_skel_img(
        img, kp[:, :2], kp_connections(fmt),
        valid=kp[:, -1] > 0,
        names=KEYPOINT_NAMES_DICT[fmt],
        draw_text=draw_text, **kwargs)


def create_bbox_img(
    img: np.ndarray,
    bounding_box: np.ndarray,
    color=(0.0, 0.0, 0.0),
    linewidth: int = 2,
) -> np.ndarray:
    """Draw an [xmin, ymin, xmax, ymax] box (reference create_bbox_img,
    plot_utils.py:220-236)."""
    import cv2

    out = np.ascontiguousarray(np.asarray(img, np.float32).copy())
    xmin, ymin, xmax, ymax = [int(round(float(v)))
                              for v in np.asarray(bounding_box).reshape(4)]
    cv2.rectangle(out, (xmin, ymin), (xmax, ymax),
                  tuple(float(c) for c in color), linewidth)
    return out

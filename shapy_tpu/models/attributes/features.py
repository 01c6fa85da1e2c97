"""Input-feature selection and preprocessing for A2S / S2A models.

Reference semantics:
  * ``get_features_from_config`` (attributes/utils/config.py:373-412):
    config booleans choose which attributes / measurements form the input
    vector; attribute keys are the lowercase/underscore forms of the
    gender-specific attribute names.
  * ``to_whw2s`` (a2b.py:353-375): BodyTalk setup — height to cm,
    weight -> sqrt(weight).
  * ``bodytalk_meas_preprocess`` (a2b.py:586-590): height*100,
    mass/weight -> cube root, applied while building the feature vector.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from shapy_tpu.models.attributes.constants import ATTRIBUTE_NAMES

MEASUREMENT_KEYS = (
    "height_bg", "weight_bg", "height_gt", "weight_gt",
    "chest", "waist", "hips",
)


def attr_key(name: str) -> str:
    return name.lower().replace(" ", "_")


def select_features(cfg: Dict) -> Tuple[List[str], np.ndarray, List[str]]:
    """(selected attribute names, their indices, selected measurement keys)."""
    ds_gender = cfg.get("ds_gender", "female")
    names = ATTRIBUTE_NAMES[ds_gender]

    attributes: List[str] = []
    if cfg.get("use_attributes", True):
        conf = cfg.get(f"{ds_gender}_attributes") or {}
        attributes = [k for k, v in conf.items() if v]

    # Names and indices MUST share one order. Indices are gathered in
    # canonical ATTRIBUTE_NAMES order, so the name list is re-sorted the
    # same way — config-dict insertion order would silently mislabel
    # feature columns.
    idx = np.asarray(
        [i for i, n in enumerate(names) if attr_key(n) in attributes],
        dtype=np.int64,
    )
    if len(idx) != len(attributes):
        raise ValueError("Some selected attributes are not annotated")
    attributes = [attr_key(names[i]) for i in idx]

    mmts: List[str] = []
    if cfg.get("use_measurements", True):
        conf = cfg.get("measurements") or {}
        mmts = [k for k, v in conf.items() if v]
    return attributes, idx, mmts


def build_feature_vector(
    batch: Dict[str, np.ndarray],
    attr_idx: np.ndarray,
    selected_mmts: Sequence[str],
    bodytalk_meas_preprocess: bool = False,
) -> np.ndarray:
    """ratings (B, 15) + measurement columns -> (B, n_features)."""
    cols = [np.asarray(batch["rating"], dtype=np.float64)[:, attr_idx]]
    for name in selected_mmts:
        m = np.asarray(batch[name], dtype=np.float64).reshape(-1, 1)
        if bodytalk_meas_preprocess:
            if "height" in name:
                m = m * 100.0
            if "mass" in name or "weight" in name:
                m = np.cbrt(m)
        cols.append(m)
    return np.concatenate(cols, axis=1)


def to_whw2s(
    features: np.ndarray,
    feature_names: Sequence[str],
    noise: np.ndarray | None = None,
) -> np.ndarray:
    """BodyTalk preprocessing of the raw feature vector (a2b.py:353-375)."""
    out = np.array(features, dtype=np.float64, copy=True)
    names = np.asarray(list(feature_names))
    h = np.nonzero(names == "height_gt")[0]
    w = np.nonzero(names == "weight_gt")[0]
    out[:, h] = out[:, h] * 100.0
    if noise is None:
        out[:, w] = np.sqrt(out[:, w])
    else:
        noise = np.array(noise, dtype=np.float64, copy=True)
        out[:, w] = np.sqrt(out[:, w] + noise[:, w])
        noise[:, w] = 0.0
        out = out + noise
    return out

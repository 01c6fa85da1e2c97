"""Demo data loaders for the attribute models.

Behavioural spec: reference ``attributes/attributes/dataloader/
demo.py:21-95``: DEMO_S2A loads per-image betas npz files + a genders
yaml; DEMO_A2S loads the joblib rating DB
(``modeldata_for_a2s_{gender}.pt``) and converts height to metres-as-is,
bust/waist/hips from cm to m.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
import yaml


class DemoS2AData:
    """Betas npz files + genders.yaml -> per-gender beta DBs."""

    def __init__(
        self,
        betas_folder: str = "../samples/shapy_fit/",
        ds_genders_path: str = "../samples/genders.yaml",
        model_gender: str = "neutral",
        model_type: str = "smplx",
    ):
        with open(ds_genders_path) as f:
            self.ds_gender = yaml.safe_load(f)
        self.betas_key = f"betas_{model_type}_{model_gender}"

        files = sorted(
            f for f in os.listdir(betas_folder) if f.endswith("npz")
        )
        self.npz_files: Dict[str, list] = {"male": [], "female": []}
        self.betas: Dict[str, list] = {"male": [], "female": []}
        for fname in files:
            # splitext, not split('.'): image ids may contain dots
            fid = os.path.splitext(fname)[0]
            gender = self.ds_gender[fid]
            data = np.load(os.path.join(betas_folder, fname))
            self.betas[gender].append(np.asarray(data["betas"]))
            self.npz_files[gender].append(fid)
        for g in ("male", "female"):
            self.betas[g] = (
                np.stack(self.betas[g]) if self.betas[g]
                else np.zeros((0, 10))
            )
        self.db: Dict = {}

    def create_db(self, ds_gender: str) -> Dict:
        from shapy_tpu.models.attributes.constants import ATTRIBUTE_NAMES

        self.db = {
            "labels": ATTRIBUTE_NAMES[ds_gender],
            self.betas_key: self.betas[ds_gender],
            "filename": self.npz_files[ds_gender],
        }
        return self.db


class DemoA2SData:
    """Joblib rating DB with BodyTalk unit conversions."""

    def __init__(
        self,
        ds_gender: str = "female",
        model_gender: str = "neutral",
        model_type: str = "smplx",
        rating_folder: str = "../samples/attributes/",
    ):
        import joblib

        path = os.path.join(
            rating_folder, f"modeldata_for_a2s_{ds_gender}.pt"
        )
        self.db = joblib.load(path)
        if "rating" not in self.db:
            self.db["rating"] = self.db["ratings"]
        self.db["height_gt"] = np.asarray(
            self.db["heights"], np.float32
        )
        for src, dst in (("bust", "chest"), ("waist", "waist"),
                         ("hips", "hips")):
            self.db[dst] = np.asarray(self.db[src], np.float32) / 100.0

"""B2A / S2A: SMPL-X shape coefficients -> linguistic attribute ratings.

Behavioural spec: reference ``attributes/attributes/attributes_betas/
b2a.py:25-206``. Input is the first ``num_shape_comps`` betas; output is
the selected attribute ratings (1-5 scale) plus optionally measurement
targets; fitting uses the polynomial/linear/NN zoo; metrics are per-output
L1 mean +- std and rounded-class accuracy.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from shapy_tpu.models.attributes.features import select_features
from shapy_tpu.models.attributes.networks import build_network
from shapy_tpu.models.attributes.polynomial import Polynomial


class B2A:
    def __init__(self, cfg: Optional[Dict] = None, **kwargs):
        cfg = dict(cfg or {}, **kwargs)
        self.cfg = cfg
        self.betas_size = int(cfg.get("num_shape_comps", 10))
        self.model_type = cfg.get("model_type", "smplx")
        self.model_gender = cfg.get("model_gender", "female")
        self.ds_gender = cfg.get("ds_gender", "female")

        self.selected_attr, self.selected_attr_idx, self.selected_mmts = (
            select_features(cfg)
        )
        self.output_feature_size = len(self.selected_attr) + len(
            self.selected_mmts
        )
        self.b2a = build_network(
            cfg.get("network"), self.betas_size, self.output_feature_size
        )

    @property
    def output_names(self):
        return list(self.selected_attr) + list(self.selected_mmts)

    # -- inference --------------------------------------------------------
    def __call__(self, betas):
        return self.b2a(betas)

    def predict(self, betas) -> np.ndarray:
        betas = np.asarray(betas)[:, : self.betas_size]
        return self.b2a.predict(betas)

    # -- fitting / evaluation ---------------------------------------------
    def _tvt(self, db: Dict) -> Tuple:
        beta_key = f"betas_{self.model_type}_{self.model_gender}"
        out = []
        for split in ("train", "val", "test"):
            d = db[split]
            # Targets in output_names order: selected attribute columns
            # followed by selected measurement columns — the network's
            # declared output width must equal the training target
            # width, or predict() silently returns fewer columns than
            # output_names claims.
            cols = [np.asarray(d["rating"])[:, self.selected_attr_idx]]
            for m in self.selected_mmts:
                cols.append(
                    np.asarray(d[m], np.float32).reshape(-1, 1))
            y = np.concatenate(cols, axis=1)
            assert y.shape[1] == self.output_feature_size
            out.append(
                (np.asarray(d[beta_key])[:, : self.betas_size], y)
            )
        return tuple(out)

    def fit(self, db: Dict) -> Dict[str, Dict[str, np.ndarray]]:
        """Fit on the train split; report val metrics (b2a.py:80-101)."""
        (xtr, ytr), (xval, yval), (xte, yte) = self._tvt(db)
        self.b2a.fit(xtr, ytr)
        report = {}
        for name, (x, y) in (("val", (xval, yval)), ("test", (xte, yte))):
            pred = self.b2a.predict(x)
            report[name] = self.metrics(y, pred)
        return report

    @staticmethod
    def metrics(gt: np.ndarray, pred: np.ndarray) -> Dict[str, np.ndarray]:
        """L1 mean/std + rounded-class accuracy (b2a.py:103-115)."""
        err = np.abs(gt - pred)
        correct = np.round(gt) == np.round(pred)
        return {
            "l1_mean": err.mean(0),
            "l1_std": err.std(0),
            "class_accuracy": correct.sum(0) / correct.shape[0],
        }

    # -- checkpoint I/O ----------------------------------------------------
    @classmethod
    def load_from_checkpoint(cls, path: str, cfg: Optional[Dict] = None
                             ) -> "B2A":
        """Import a reference Lightning checkpoint — any network type
        (reference b2a.py:25-61; importer ckpt_import.py)."""
        from shapy_tpu.io.torch_import import load_torch_file

        ckpt = load_torch_file(path)
        hp = ckpt.get("hyper_parameters", {})
        conf = dict(hp.get("cfg", {}) if isinstance(hp, dict) else {})
        if cfg:
            conf.update(cfg)
        obj = cls(conf)
        sd = ckpt.get("state_dict", ckpt.get("model", {}))
        if any(k.startswith("b2a.") for k in sd):
            from shapy_tpu.models.attributes.ckpt_import import (
                import_network,
            )

            import_network(obj.b2a, sd, "b2a.")
        return obj

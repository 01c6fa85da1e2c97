"""A2B / A2S: linguistic attributes (+ measurements) -> SMPL-X betas.

Behavioural spec: reference ``attributes/attributes/attributes_betas/
a2b.py:97-1203``. Covers: config-driven input-feature selection, the two
preprocessing modes (whw2s sqrt-weight vs BodyTalk cube-root,
a2b.py:353-375,586-590), closed-form polynomial fitting with
train/val/test or leave-one-out protocols, and reconstruction metrics
(v2v, measurement MAEs) when a body model + measurement module are
attached.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from shapy_tpu.models.attributes.features import (
    build_feature_vector,
    select_features,
    to_whw2s,
)
from shapy_tpu.models.attributes.networks import build_network
from shapy_tpu.models.attributes.polynomial import Polynomial


class A2B:
    def __init__(self, cfg: Optional[Dict] = None, body_model=None,
                 meas_module=None, **kwargs):
        cfg = dict(cfg or {}, **kwargs)
        self.cfg = cfg
        self.betas_size = int(cfg.get("num_shape_comps", 10))
        self.model_type = cfg.get("model_type", "smplx")
        self.model_gender = cfg.get("model_gender", "neutral")
        self.ds_gender = cfg.get("ds_gender", "female")
        self.bodytalk_meas_preprocess = bool(
            cfg.get("bodytalk_meas_preprocess", False)
        )
        reg = dict(cfg.get("regression") or {})
        self.whw2s_model = bool(reg.get("use_whw2s_setting", False))
        self.use_loo = bool(reg.get("use_loo", False))

        self.selected_attr, self.selected_attr_idx, self.selected_mmts = (
            select_features(cfg)
        )
        self.input_feature_size = len(self.selected_attr) + len(
            self.selected_mmts
        )
        self.a2b = build_network(
            cfg.get("network"), self.input_feature_size, self.betas_size
        )
        self.body_model = body_model
        self.meas_module = meas_module

    @property
    def feature_names(self) -> List[str]:
        return list(self.selected_attr) + list(self.selected_mmts)

    # -- features ----------------------------------------------------------
    def create_input_feature_vec(self, batch: Dict) -> np.ndarray:
        """batch with 'rating' + measurement keys -> (B, n_features)
        (a2b.py:569-602, noise channels omitted at inference)."""
        return build_feature_vector(
            batch,
            self.selected_attr_idx,
            self.selected_mmts,
            self.bodytalk_meas_preprocess,
        )

    def preprocess(self, features: np.ndarray) -> np.ndarray:
        if self.whw2s_model:
            return to_whw2s(features, self.feature_names)
        return features

    def create_input_feature_vec_jax(self, batch):
        """Traceable feature-vec construction for use inside the jitted
        regressor forward (iterative_regressor.py:819-843). Matches the
        reference exactly: only the bodytalk measurement preprocessing is
        applied here (a2b.py:586-590); the whw2s transform is a fit-time
        concern and is NOT applied on this path."""
        cols = [jnp.asarray(batch["rating"])[:, self.selected_attr_idx]]
        for name in self.selected_mmts:
            m = jnp.asarray(batch[name]).reshape(-1, 1)
            if self.bodytalk_meas_preprocess:
                if "height" in name:
                    m = m * 100.0
                if "mass" in name or "weight" in name:
                    m = jnp.cbrt(m)
            cols.append(m)
        return jnp.concatenate(cols, axis=1)

    # -- inference ---------------------------------------------------------
    def predict(self, features) -> np.ndarray:
        return self.a2b.predict(self.preprocess(np.asarray(features)))

    def predict_shape(self, features):
        """features -> betas -> v_shaped (requires an attached body model)."""
        betas = jnp.asarray(self.predict(features), dtype=jnp.float32)
        assert self.body_model is not None, "attach a body model first"
        return betas, self.body_model.forward_shape(betas)["v_shaped"]

    # -- fitting -----------------------------------------------------------
    def _tvt(self, db: Dict) -> Tuple:
        beta_key = f"betas_{self.model_type}_{self.model_gender}"
        out = []
        for split in ("train", "val", "test"):
            d = db[split]
            out.append(
                (
                    self.create_input_feature_vec(d),
                    np.asarray(d[beta_key])[:, : self.betas_size],
                )
            )
        return tuple(out)

    def fit(self, db: Dict) -> Dict[str, Dict[str, float]]:
        (xtr, ytr), (xval, yval), (xte, yte) = self._tvt(db)
        self.a2b.fit(self.preprocess(xtr), ytr)
        report = {}
        for name, (x, y) in (("val", (xval, yval)), ("test", (xte, yte))):
            pred = self.a2b.predict(self.preprocess(x))
            report[name] = self.validate(y, pred)
        return report

    def fit_nn(
        self,
        db: Dict,
        v2v_weight: float = 1.0,
        betas_weight: float = 0.0,
        edge_weight: float = 0.0,
        meas_weights: Optional[Dict[str, float]] = None,
        num_steps: int = 2000,
        learning_rate: float = 1e-3,
        batch_size: int = 256,
        seed: int = 0,
    ) -> Dict[str, Dict[str, float]]:
        """NN training with mesh-space losses (reference a2b.py:604-734):
        v2v on forward_shape vertices, optional edge loss, optional
        differentiable measurement losses — requires an attached body
        model (+ measurement module for meas terms)."""
        import jax
        import optax

        from shapy_tpu.core.geometry import faces_to_edges
        from shapy_tpu.models.attributes.networks import FlaxRegressor

        assert isinstance(self.a2b, FlaxRegressor), (
            "fit_nn requires an NN network type (mlp/resnet/moe)"
        )
        assert self.body_model is not None, "attach a body model"
        meas_weights = dict(meas_weights or {})

        (xtr, ytr), (xval, yval), _ = self._tvt(db)
        X = jnp.asarray(self.preprocess(xtr), jnp.float32)
        Y = jnp.asarray(ytr, jnp.float32)
        model = self.body_model
        faces = model.faces
        edges = faces_to_edges(faces) if edge_weight > 0 else None
        meas = self.meas_module

        def loss_fn(variables, xb, yb):
            pred_betas = self.a2b.module.apply(variables, xb)
            pred_out = model.forward_shape(pred_betas)["v_shaped"]
            gt_out = model.forward_shape(yb)["v_shaped"]
            loss = 0.0
            if v2v_weight > 0:
                loss += v2v_weight * jnp.mean(
                    jnp.linalg.norm(pred_out - gt_out, axis=-1)
                )
            if betas_weight > 0:
                loss += betas_weight * jnp.mean((pred_betas - yb) ** 2)
            if edge_weight > 0:
                from shapy_tpu.losses.losses import vertex_edge_loss

                loss += edge_weight * vertex_edge_loss(
                    pred_out, gt_out, edges
                )
            if meas_weights and meas is not None:
                # SoA fast path (full-lane-width slice+hull; BENCH.md)
                pm = meas.forward_from_vertices(
                    pred_out, faces)["measurements"]
                gm = meas.forward_from_vertices(
                    gt_out, faces)["measurements"]
                for k, w in meas_weights.items():
                    if w > 0:
                        loss += w * jnp.mean(
                            jnp.abs(pm[k]["tensor"] - gm[k]["tensor"])
                        )
            return loss

        tx = optax.adam(learning_rate)
        opt_state = tx.init(self.a2b.variables)

        @jax.jit
        def step(variables, opt_state, key):
            idx = jax.random.randint(
                key, (min(batch_size, X.shape[0]),), 0, X.shape[0]
            )
            loss, grads = jax.value_and_grad(loss_fn)(
                variables, X[idx], Y[idx]
            )
            updates, opt_state = tx.update(grads, opt_state, variables)
            return optax.apply_updates(variables, updates), opt_state, loss

        key = jax.random.PRNGKey(seed)
        v = self.a2b.variables
        for _ in range(num_steps):
            key, sub = jax.random.split(key)
            v, opt_state, _ = step(v, opt_state, sub)
        self.a2b.variables = v

        pred = self.a2b.predict(self.preprocess(xval))
        return {"val": self.validate(yval, pred)}

    def fit_loo(self, features: np.ndarray, betas: np.ndarray
                ) -> Dict[str, float]:
        """Leave-one-out cross-validation (a2b.py:377-413)."""
        n = features.shape[0]
        preds = np.zeros_like(betas[:, : self.betas_size])
        for i in range(n):
            mask = np.arange(n) != i
            self.a2b.fit(
                self.preprocess(features[mask]),
                betas[mask, : self.betas_size],
            )
            preds[i] = self.a2b.predict(self.preprocess(features[i:i + 1]))[0]
        return self.validate(betas[:, : self.betas_size], preds)

    # -- metrics -----------------------------------------------------------
    def validate(self, gt_betas: np.ndarray, pred_betas: np.ndarray
                 ) -> Dict[str, float]:
        """Reconstruction metrics; v2v / measurements when a model is
        attached (a2b.py:968-1029)."""
        out: Dict[str, float] = {
            "betas_l1": float(np.abs(gt_betas - pred_betas).mean())
        }
        if self.body_model is None:
            return out
        gt_v = np.asarray(
            self.body_model.forward_shape(
                jnp.asarray(gt_betas, jnp.float32))["v_shaped"]
        )
        pr_v = np.asarray(
            self.body_model.forward_shape(
                jnp.asarray(pred_betas, jnp.float32))["v_shaped"]
        )
        # Translation-align on the mean before v2v (reference aligns meshes).
        gt_v = gt_v - gt_v.mean(axis=1, keepdims=True)
        pr_v = pr_v - pr_v.mean(axis=1, keepdims=True)
        out["v2v_mm"] = float(
            np.linalg.norm(gt_v - pr_v, axis=-1).mean() * 1000.0
        )
        if self.meas_module is not None:
            faces = self.body_model.faces
            gt_m = self.meas_module.forward_from_vertices(
                jnp.asarray(gt_v), faces)["measurements"]
            pr_m = self.meas_module.forward_from_vertices(
                jnp.asarray(pr_v), faces)["measurements"]
            for k in ("height", "chest", "waist", "hips"):
                out[f"{k}_mae_mm"] = float(
                    np.abs(
                        np.asarray(gt_m[k]["tensor"])
                        - np.asarray(pr_m[k]["tensor"])
                    ).mean() * 1000.0
                )
            out["mass_mae_kg"] = float(
                np.abs(
                    np.asarray(gt_m["mass"]["tensor"])
                    - np.asarray(pr_m["mass"]["tensor"])
                ).mean()
            )
        return out

    # -- checkpoint I/O ----------------------------------------------------
    @classmethod
    def load_from_checkpoint(cls, path: str, cfg: Optional[Dict] = None,
                             **kwargs) -> "A2B":
        from shapy_tpu.io.torch_import import load_torch_file

        ckpt = load_torch_file(path)
        hp = ckpt.get("hyper_parameters", {})
        conf = dict(hp.get("cfg", {}) if isinstance(hp, dict) else {})
        if cfg:
            conf.update(cfg)
        obj = cls(conf, **kwargs)
        sd = ckpt.get("state_dict", ckpt.get("model", {}))
        if any(k.startswith("a2b.") for k in sd):
            # Any network type imports (MLP/resnet/MoE/IMoE/iterative/
            # linear/simple/polynomial) — reference surface demo.py:54.
            from shapy_tpu.models.attributes.ckpt_import import (
                import_network,
            )

            import_network(obj.a2b, sd, "a2b.")
        return obj

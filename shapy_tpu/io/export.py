"""Production export / serving artifacts via ``jax.export`` (StableHLO).

The reference has no export or serving subsystem — its serving story is
re-running the demo loop in a Python process with the full model-building
code imported (``regressor/demo.py:122-355``). On TPU the idiomatic
production path is ahead-of-time export: trace the flagship forward once,
serialize it as StableHLO with jax.export's versioning guarantees, and
reload it in a serving process that needs neither the model-construction
code nor the config stack.

Artifact layout (a directory)::

    model.jaxexport    serialized jax.export.Exported:
                         fn(params, model_params, images) -> outputs
    params.npz         regressor parameters, path-keyed flat npz
    model_params.npz   body-model constants (blend shapes, regressors)
    metadata.json      jax version, platforms, signature, output tree

Two deliberate design points:

- **Weights are artifact inputs, not embedded constants.** Closing the
  network weights + SMPL-X blend shapes (~100 MB at full scale) into the
  traced function would embed them verbatim in the serialized module
  (measured cost documented at ``BodyRegressor.apply``'s ``model_params``
  note: closure-captured arrays bloat the HLO proto and slow every
  compile). Keeping them as inputs makes the export fast, the artifact
  compact, and checkpoints swappable without re-export.
- **The batch dimension is symbolic by default** (shape polymorphism):
  one artifact serves every batch size. Pass ``batch_size=N`` for a
  fixed-shape export when the serving fleet pads to known buckets.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "FLAGSHIP_OUTPUT_KEYS",
    "make_serving_fn",
    "export_regressor",
    "save_serving_artifact",
    "ServingModel",
    "flatten_params",
    "unflatten_params",
]

# Key separator for the flat npz: \x1f (ASCII unit separator) never
# appears in parameter names (they use '/', '.', alphanumerics).
_SEP = "\x1f"

# Default serving outputs: the reference demo's npz export surface
# (regressor/demo.py:336-353 saves the decoded stage params + camera),
# plus the virtual measurements.
FLAGSHIP_OUTPUT_KEYS = (
    "betas",
    "vertices",
    "v_shaped",
    "joints",
    "proj_joints",
    "camera_parameters",
    "measurements",
)


def flatten_params(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    """Nested-dict pytree -> flat {joined-path: array} dict."""
    flat: Dict[str, np.ndarray] = {}
    for key, value in tree.items():
        if not isinstance(key, str):
            raise TypeError(f"non-string pytree key {key!r}")
        path = f"{prefix}{_SEP}{key}" if prefix else key
        if isinstance(value, dict):
            flat.update(flatten_params(value, path))
        else:
            flat[path] = np.asarray(value)
    return flat


def unflatten_params(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, value in flat.items():
        parts = path.split(_SEP)
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


def _array_only(tree):
    """Drop non-array leaves (e.g. the weak-persp ``scale_first`` bool)
    so the serving function is a valid jit return."""
    import jax.numpy as jnp

    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            kept = _array_only(v)
            if kept is not None:
                out[k] = kept
        return out or None
    if isinstance(tree, jnp.ndarray):
        return tree
    return None


def make_serving_fn(regressor, outputs: Optional[Sequence[str]] = None,
                    from_full_images: bool = False, crop_size: int = 256):
    """Eval-mode forward closing over only static structure.

    Returns ``fn(params, model_params, images) -> dict`` with the
    requested output keys (default :data:`FLAGSHIP_OUTPUT_KEYS`).
    BN runs folded (eval default), the backbone in the regressor's
    configured compute dtype.

    ``from_full_images=True`` exports the production ingest path
    instead: ``fn(params, model_params, full_images_u8, affines)`` takes
    raw uint8 frames + crop->image affines and runs the fused on-device
    decode/crop/normalize (``apply_from_full_images``) — a 4x smaller
    host->device transfer than f32 crops.
    """
    keys = tuple(outputs or FLAGSHIP_OUTPUT_KEYS)
    explicit = outputs is not None
    last_key = f"stage_{regressor.num_stages - 1:02d}"

    def _select(out):
        last = out[last_key]
        result = {}
        missing = []
        for key in keys:
            if key in last:
                result[key] = last[key]
            elif key in out:
                result[key] = out[key]
            else:
                missing.append(key)
        # Explicitly requested keys must exist — a typo'd or
        # configuration-absent output should fail at export time, not be
        # discovered as a missing field at serving time. (The default
        # key set tolerates absences: e.g. measurements when the model
        # has no measurement module.)
        if explicit and missing:
            raise KeyError(
                f"requested serving outputs not produced by this model: "
                f"{missing}; available: {sorted(set(last) | set(out))}"
            )
        return _array_only(result)

    if from_full_images:
        def serving_fn(params, model_params, full_images, affines):
            return _select(regressor.apply_from_full_images(
                params, full_images, affines, crop_size=crop_size,
                model_params=model_params,
            ))
    else:
        def serving_fn(params, model_params, images):
            return _select(regressor.apply(
                params, images, model_params=model_params))

    return serving_fn


def export_regressor(
    regressor,
    *,
    batch_size: Optional[int] = None,
    image_size: int = 256,
    platforms: Sequence[str] = ("tpu", "cpu"),
    outputs: Optional[Sequence[str]] = None,
    mesh=None,
    from_full_images: bool = False,
    full_image_size: Tuple[int, int] = (480, 360),
):
    """Trace + export the flagship forward.

    ``batch_size=None`` exports with a symbolic batch dimension. Returns
    ``(exported, metadata)`` where ``exported`` is a
    ``jax.export.Exported`` and ``metadata`` a JSON-able description.

    ``mesh``: a ``jax.sharding.Mesh`` for pod serving — the export is
    traced under GSPMD with the batch sharded over the mesh's first axis
    and weights replicated, so one artifact serves a whole slice via
    data-parallel inference (the calling process must hold a mesh with
    the same device count). Requires a fixed ``batch_size`` divisible by
    the data-axis size.
    """
    import jax
    from jax import export as jex

    fn = make_serving_fn(regressor, outputs,
                         from_full_images=from_full_images,
                         crop_size=image_size)

    if batch_size is None:
        if mesh is not None:
            raise ValueError("sharded export requires a fixed batch_size")
        (bdim,) = jex.symbolic_shape("b")
        batch: Any = bdim
    else:
        batch = int(batch_size)

    if from_full_images:
        height, width = (int(s) for s in full_image_size)
        image_spec: Any = (
            jax.ShapeDtypeStruct((batch, height, width, 3), np.uint8),
            jax.ShapeDtypeStruct((batch, 3, 3), np.float32),
        )
    else:
        image_spec = jax.ShapeDtypeStruct(
            (batch, image_size, image_size, 3), np.float32
        )
    param_specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), regressor.params
    )
    model_specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
        regressor.model.params,
    )

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        data_axis = mesh.axis_names[0]
        if batch % mesh.shape[data_axis] != 0:
            raise ValueError(
                f"batch_size {batch} not divisible by data-axis size "
                f"{mesh.shape[data_axis]}"
            )
        replicated = NamedSharding(mesh, PartitionSpec())
        batch_sharded = NamedSharding(mesh, PartitionSpec(data_axis))
        data_shardings = (
            (batch_sharded, batch_sharded) if from_full_images
            else (batch_sharded,)
        )
        jitted = jax.jit(
            fn, in_shardings=(replicated, replicated) + data_shardings
        )
    else:
        jitted = jax.jit(fn)

    data_specs = image_spec if isinstance(image_spec, tuple) else (image_spec,)
    exported = jex.export(jitted, platforms=list(platforms))(
        param_specs, model_specs, *data_specs
    )

    # Rebuild the NAMED output tree (out_avals is the flat tuple): the
    # artifact must be self-describing from metadata alone.
    named_outputs = jax.tree.unflatten(exported.out_tree,
                                       list(exported.out_avals))
    out_tree = jax.tree.map(
        lambda s: {"shape": [str(d) for d in s.shape],
                   "dtype": str(s.dtype)},
        named_outputs,
    )
    metadata = {
        "format": "shapy_tpu.serving/1",
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "batch": "symbolic" if batch_size is None else int(batch_size),
        "mesh": (None if mesh is None else
                 {"axis_names": list(mesh.axis_names),
                  "shape": [int(mesh.shape[a]) for a in mesh.axis_names],
                  "num_devices": int(mesh.size)}),
        "image_size": int(image_size),
        "from_full_images": bool(from_full_images),
        "full_image_size": (list(int(s) for s in full_image_size)
                            if from_full_images else None),
        "input_layout": (
            "uint8 full frames (B,H,W,3) + crop->image affines (B,3,3); "
            "on-device decode/crop/normalize" if from_full_images
            else "NHWC float32, demo normalization"),
        "num_stages": int(regressor.num_stages),
        # Camera convention: the weak-persp scale_first flag is a static
        # (non-array) attribute dropped from the output tree by
        # _array_only, so record it here — a serving consumer must know
        # which convention the camera_parameters follow
        # (reference camera_projection.py:202-208 branches on it).
        "camera": {
            "type": type(regressor.projection).__name__,
            "scale_first": bool(
                getattr(regressor.projection, "scale_first", False)
            ),
        },
        "outputs": jax.tree.map(lambda x: x, out_tree),
        "calling_convention": (
            "exported.call(params, model_params, full_images_u8, affines)"
            if from_full_images
            else "exported.call(params, model_params, images)"),
    }
    return exported, metadata


def save_serving_artifact(
    out_dir: str,
    regressor,
    *,
    batch_size: Optional[int] = None,
    image_size: int = 256,
    platforms: Sequence[str] = ("tpu", "cpu"),
    outputs: Optional[Sequence[str]] = None,
    from_full_images: bool = False,
    full_image_size: Tuple[int, int] = (480, 360),
) -> Dict[str, Any]:
    """Export ``regressor`` and write the full serving artifact directory."""
    exported, metadata = export_regressor(
        regressor,
        batch_size=batch_size,
        image_size=image_size,
        platforms=platforms,
        outputs=outputs,
        from_full_images=from_full_images,
        full_image_size=full_image_size,
    )
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "model.jaxexport"), "wb") as f:
        f.write(exported.serialize())
    np.savez(os.path.join(out_dir, "params.npz"),
             **flatten_params(regressor.params))
    np.savez(os.path.join(out_dir, "model_params.npz"),
             **flatten_params(regressor.model.params))
    with open(os.path.join(out_dir, "metadata.json"), "w") as f:
        json.dump(metadata, f, indent=2, sort_keys=True)
    return metadata


class ServingModel:
    """Reload + run a serving artifact without the model-building code.

    >>> served = ServingModel.load("/path/to/artifact")
    >>> out = served.predict(images)          # (B, H, W, 3) float32
    """

    def __init__(self, exported, params, model_params,
                 metadata: Dict[str, Any]):
        self.exported = exported
        self.params = params
        self.model_params = model_params
        self.metadata = metadata
        self._jitted = None

    @classmethod
    def load(cls, artifact_dir: str) -> "ServingModel":
        from jax import export as jex

        with open(os.path.join(artifact_dir, "model.jaxexport"), "rb") as f:
            exported = jex.deserialize(f.read())
        with open(os.path.join(artifact_dir, "metadata.json")) as f:
            metadata = json.load(f)

        def _load_npz(name):
            with np.load(os.path.join(artifact_dir, name)) as data:
                return unflatten_params({k: data[k] for k in data.files})

        return cls(exported, _load_npz("params.npz"),
                   _load_npz("model_params.npz"), metadata)

    def update_params(self, params) -> None:
        """Swap in new weights (same tree/shapes) without re-export.

        The jit wrapper is deliberately kept: weights are call
        *arguments*, so the executable cache hits for same-shape swaps —
        no recompile on checkpoint update.
        """
        self.params = params

    def predict(self, images, affines=None) -> Dict[str, Any]:
        """Run the artifact. Crop-mode artifacts take normalised f32
        crops; full-frame artifacts (``from_full_images`` in metadata)
        take raw uint8 frames plus crop->image ``affines`` (B, 3, 3)."""
        import jax

        full_frames = self.metadata.get("from_full_images", False)
        if full_frames != (affines is not None):
            raise ValueError(
                "full-frame artifacts require `affines`; crop artifacts "
                "forbid it (from_full_images="
                f"{full_frames})"
            )
        if full_frames:
            frames = np.asarray(images)
            if not np.issubdtype(frames.dtype, np.integer):
                # The artifact was traced with a uint8 input spec; a
                # silent cast would truncate [0,1] float frames to
                # all-zero pixels. (The live apply_from_full_images
                # accepts floats; the exported artifact does not.)
                raise TypeError(
                    "full-frame artifacts take raw uint8 frames "
                    f"(got dtype {frames.dtype}); scale floats to 0-255 "
                    "uint8 before predict()"
                )
            if frames.dtype != np.uint8 and (
                frames.size and (frames.min() < 0 or frames.max() > 255)
            ):
                # Wider integer dtypes are accepted only when the values
                # actually fit a byte — astype(uint8) would otherwise
                # truncate them modulo 256 silently.
                raise ValueError(
                    f"integer frames of dtype {frames.dtype} contain "
                    "values outside [0, 255]; pass genuine uint8 pixels"
                )
            want = tuple(self.metadata["full_image_size"]) + (3,)
            data = (frames.astype(np.uint8),
                    np.asarray(affines, np.float32))
        else:
            expected = self.metadata.get("image_size")
            want = (expected, expected, 3)
            data = (np.asarray(images, np.float32),)
        if tuple(np.shape(images)[1:]) != want:
            raise ValueError(
                f"images must be (B, {', '.join(map(str, want))}); got "
                f"{np.shape(images)}"
            )
        batch = self.metadata.get("batch")
        if batch != "symbolic" and np.shape(images)[0] != batch:
            raise ValueError(
                f"artifact was exported at fixed batch {batch}; got "
                f"batch {np.shape(images)[0]}"
            )
        if self._jitted is None:
            # Wrap the exported call in jit so repeated predicts reuse
            # the executable instead of re-lowering per call.
            self._jitted = jax.jit(self.exported.call)
        return self._jitted(self.params, self.model_params, *data)

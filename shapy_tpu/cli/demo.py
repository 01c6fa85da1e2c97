"""SHAPY regressor demo: images + OpenPose keypoints -> SMPL-X fits.

Behavioural spec: reference ``regressor/demo.py:122-439`` — same flags
(--exp-cfg/--exp-opts layered config, --datasets, --output-folder,
--save-vis/--save-params/--save-mesh), same outputs per image: a
compressed npz of the stage_02 parameters + blender-style camera
conversion (fname, vertices, v_shaped, joints, betas, global_rot,
raw_global_rot, body_pose, raw_body_pose, camera, measurements,
proj_joints, shift_x, shift_y, transl, focal_length_in_mm/px, center,
sensor_width — schema matches samples/shapy_fit_for_virtual_measurements),
a .ply mesh, and a rendered overlay.

TPU-first: the whole per-batch model forward (backbone -> head -> SMPL-X
-> measurements) is one jit; rendering stays host-side off the hot path,
as in the reference.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import Dict

import numpy as np

DEFAULT_FOCAL_LENGTH = 5000.0
DEFAULT_SENSOR_WIDTH = 36.0


def weak_persp_to_blender(
    orig_centers: np.ndarray,
    orig_bbox_sizes: np.ndarray,
    camera_scale: np.ndarray,
    camera_transl: np.ndarray,
    H: int,
    W: int,
    sensor_width: float = DEFAULT_SENSOR_WIDTH,
    focal_length: float = DEFAULT_FOCAL_LENGTH,
) -> Dict[str, np.ndarray]:
    """Weak-perspective -> perspective (Blender) camera
    (reference demo.py:70-106): z = 2f / (s * bbox_size)."""
    from shapy_tpu.render.rasterizer import (
        weak_persp_to_blender as _wp_transl)

    camera_scale = np.asarray(camera_scale).reshape(-1)
    transl = _wp_transl(camera_scale, camera_transl, orig_bbox_sizes,
                        focal_length=focal_length)
    shift_x = -(orig_centers[:, 0] / W - 0.5)
    shift_y = (orig_centers[:, 1] - 0.5 * H) / W
    n = len(camera_scale)
    return {
        "shift_x": shift_x,
        "shift_y": shift_y,
        "transl": transl,
        "focal_length_in_mm": np.full(n, focal_length / W * sensor_width),
        "focal_length_in_px": np.full(n, focal_length),
        "center": orig_centers,
        "sensor_width": np.full(n, sensor_width),
    }


def build_demo_regressor(exp_cfg: Dict, checkpoint_path: str = ""):
    """Build the flagship regressor from a layered config; import the
    reference torch checkpoint when provided."""
    import jax.numpy as jnp

    from shapy_tpu.models.body import SMPLX, make_synthetic_model_data
    from shapy_tpu.models.heads import build_body_head
    from shapy_tpu.measure import BodyMeasurements, MeasurementAnchors

    body_cfg = dict(exp_cfg.get("body_model") or {})
    model_folder = os.path.expandvars(body_cfg.get("model_folder", ""))
    smplx_cfg = dict(body_cfg.get("smplx") or {})
    use_synthetic = (
        os.environ.get("SHAPY_TPU_SYNTHETIC_BODY", "0") == "1"
        or not os.path.isdir(model_folder)
    )
    if use_synthetic:
        subdiv = int(os.environ.get("SHAPY_TPU_TEST_SUBDIV", "5"))
        body_model = SMPLX(
            model_data=make_synthetic_model_data("smplx",
                                                 subdivisions=subdiv),
            num_betas=int((smplx_cfg.get("betas") or {}).get("num", 10)),
        )
        anchors = MeasurementAnchors.synthetic(
            body_model.faces, np.asarray(body_model.params["v_template"])
        )
        measurements = BodyMeasurements(anchors=anchors)
    else:
        body_model = SMPLX(
            model_folder=model_folder,
            num_betas=int((smplx_cfg.get("betas") or {}).get("num", 10)),
            num_expression_coeffs=int(
                (smplx_cfg.get("expression") or {}).get("num", 10)
            ),
            use_face_contour=bool(smplx_cfg.get("use_face_contour", False)),
        )
        measurements = BodyMeasurements(model_type="smplx")

    # Frozen B2A / A2B attribute plugins (reference
    # iterative_regressor.py:146-204): loaded per gender when the config
    # enables them and the checkpoints exist.
    net_sub = dict(
        (exp_cfg.get("network") or {}).get("smplx")
        or (exp_cfg.get("network") or {}).get("smpl")
        or {}
    )

    def _load_pair(cls, prefix):
        models = {}
        for gender in ("males", "females"):
            path = os.path.expandvars(
                net_sub.get(f"{prefix}_{gender}_checkpoint", "") or ""
            )
            if path and os.path.exists(path):
                models[gender[:-1]] = cls.load_from_checkpoint(path)
        return models if len(models) == 2 else {}

    b2a_models = {}
    a2b_models = {}
    if net_sub.get("use_b2a"):
        from shapy_tpu.models.attributes.b2a import B2A

        b2a_models = _load_pair(B2A, "b2a")
    if net_sub.get("use_a2b"):
        from shapy_tpu.models.attributes.a2b import A2B

        a2b_models = _load_pair(A2B, "a2b")

    regressor = build_body_head(
        exp_cfg,
        body_model=body_model,
        measurements=measurements,
        b2a_models=b2a_models,
        a2b_models=a2b_models,
    )

    # Performance knobs (measured trade-offs in BENCH.md): bfloat16
    # backbone compute with f32 params/BN stats, and the backbone remat
    # mode ("none" | "stages" | "convs") that makes batch >= 192 fit the
    # 16 GB HBM during training.
    dtype_name = str(net_sub.get("compute_dtype", "") or "")
    if dtype_name in ("bfloat16", "bf16"):
        regressor.backbone_compute_dtype = jnp.bfloat16
    elif dtype_name and dtype_name != "float32":
        raise ValueError(
            f"network compute_dtype must be float32|bfloat16, got "
            f"{dtype_name!r}")
    remat = net_sub.get("remat")
    if remat is not None:
        regressor.backbone_remat = str(remat)

    if checkpoint_path and os.path.exists(checkpoint_path):
        from shapy_tpu.io.model_import import load_reference_model_checkpoint

        regressor.params = load_reference_model_checkpoint(
            checkpoint_path, regressor.params
        )
    return regressor


def main(
    exp_cfg: Dict,
    demo_output_folder: str = "demo_output",
    datasets=("openpose",),
    save_vis: bool = True,
    save_params: bool = False,
    save_mesh: bool = False,
    split: str = "test",
    batch_size: int = 1,
    focal_length: float = DEFAULT_FOCAL_LENGTH,
) -> int:
    import jax
    import jax.numpy as jnp

    from shapy_tpu.data.datasets import OpenPoseDataset
    from shapy_tpu.data.transforms import build_transforms

    os.makedirs(demo_output_folder, exist_ok=True)

    ds_cfg = dict(exp_cfg.get("datasets") or {})
    pose_cfg = dict(ds_cfg.get("pose") or {})
    op_cfg = dict(pose_cfg.get("openpose") or {})
    data_folder = op_cfg.get("data_folder", "data/openpose")

    transforms = build_transforms(
        {"crop_size": int(ds_cfg.get("crop_size", 256))},
        is_train=False,
        return_full_imgs=True,
    )
    # Build every requested dataset (reference demo.py --datasets): the
    # default 'openpose' reads the demo image/keypoint folders; any
    # other registry dataset pulls its config from the pose/shape
    # sections.
    built = []
    for name in datasets:
        if name == "openpose":
            ds = OpenPoseDataset(
                data_folder=data_folder,
                img_folder=op_cfg.get("img_folder", "images"),
                keyp_folder=op_cfg.get("keyp_folder", "keypoints"),
                transforms=transforms,
                split=split,
            )
        else:
            from shapy_tpu.data.build import build_dataset

            section = None
            for part in ("pose", "shape"):
                part_cfg = dict(ds_cfg.get(part) or {})
                if name in part_cfg:
                    section = part_cfg
                    break
            ds = build_dataset(name, section or {name: {}}, split,
                               transforms)
        if len(ds) > 0:
            built.append(ds)
    if not built:
        print("No inputs found", file=sys.stderr)
        return 1

    class _Concat:
        def __init__(self, parts):
            self.parts = parts
            self.lens = [len(p) for p in parts]

        def __len__(self):
            return sum(self.lens)

        def __getitem__(self, i):
            for p, n in zip(self.parts, self.lens):
                if i < n:
                    return p[i]
                i -= n
            raise IndexError(i)

    dataset = built[0] if len(built) == 1 else _Concat(built)

    checkpoint = os.path.expandvars(exp_cfg.get("pretrained", "") or "")
    regressor = build_demo_regressor(exp_cfg, checkpoint)

    @jax.jit
    def forward(params, images):
        return regressor.apply(params, images)

    @jax.jit
    def forward_fused(params, full_images, affines):
        """Batched fused path: on-device crop + normalize + forward
        (regressor.apply_from_full_images)."""
        return regressor.apply_from_full_images(
            params, full_images, affines,
            crop_size=int(ds_cfg.get("crop_size", 256)),
        )

    def run_batch(samples):
        """One forward over a batch of samples; returns the output dict."""
        if batch_size > 1 and all(
            s.get("image") is not None and "crop_to_image" in s
            for s in samples
        ):
            # Pad full images to the batch max so one fused jit program
            # crops all of them on device. Bottom/right zero-padding does
            # not move crop->image coordinates.
            Hm = max(s["image"].shape[0] for s in samples)
            Wm = max(s["image"].shape[1] for s in samples)
            full = np.zeros((len(samples), Hm, Wm, 3), np.float32)
            for i, s in enumerate(samples):
                h, w = s["image"].shape[:2]
                full[i, :h, :w] = s["image"]
            affines = np.stack(
                [np.asarray(s["crop_to_image"], np.float32)
                 for s in samples]
            )
            return forward_fused(
                regressor.params, jnp.asarray(full), jnp.asarray(affines)
            )
        images = jnp.asarray(
            np.stack([s["cropped_image"] for s in samples])
        )
        return forward(regressor.params, images)

    def iter_chunks(size):
        """Stream at most ``size`` decoded samples at a time — holding
        every full-resolution image of a large folder in memory at once
        would OOM before the first output."""
        chunk = []
        for i in range(len(dataset)):
            s = dataset[i]
            if s is None:
                continue
            chunk.append(s)
            if len(chunk) == size:
                yield chunk
                chunk = []
        if chunk:
            yield chunk

    total_time, cnt = 0.0, 0
    for chunk in iter_chunks(max(batch_size, 1)):

        start = time.perf_counter()
        out = run_batch(chunk)
        jax.block_until_ready(out["proj_joints"])
        total_time += time.perf_counter() - start
        cnt += len(chunk)

        for bi, sample in enumerate(chunk):
            _save_sample_outputs(
                regressor, out, bi, sample, demo_output_folder,
                save_params, save_mesh, save_vis,
                focal_length=focal_length,
            )

    if cnt:
        print(f"Average inference time: {total_time / cnt}")
        print(
            f"Throughput: {cnt / total_time:.2f} images/sec "
            f"(batch size {batch_size})"
        )
    else:
        from shapy_tpu.utils.logging import get_logger

        get_logger(__name__).warning(
            "No usable samples found (check data_folder/img_folder/"
            "keyp_folder and keypoint confidences); nothing written."
        )
    return 0


def _save_sample_outputs(regressor, out, bi, sample, demo_output_folder,
                         save_params, save_mesh, save_vis,
                         focal_length=DEFAULT_FOCAL_LENGTH):
    """Write the per-image npz/ply/overlay outputs (schema identical to
    the batch-1 demo and the reference demo.py:321-353)."""
    import numpy as np

    stage = out[f"stage_{regressor.num_stages - 1:02d}"]
    cam = out["camera_parameters"]
    full_img = sample.get("image")
    H, W = (full_img.shape[:2] if full_img is not None else (256, 256))
    hd_params = weak_persp_to_blender(
        np.asarray(sample["orig_center"]).reshape(1, 2),
        np.asarray([sample["orig_bbox_size"]]),
        np.asarray(cam["scale"])[bi:bi + 1],
        np.asarray(cam["translation"])[bi:bi + 1],
        H, W,
        focal_length=focal_length,
    )

    imgname = os.path.splitext(sample["fname"])[0]
    vertices = np.asarray(stage["vertices"][bi])
    faces = regressor.model.faces

    if save_params:
        B = np.asarray(out["proj_joints"]).shape[0]
        out_params: Dict[str, np.ndarray] = {"fname": sample["fname"]}
        for key, val in stage.items():
            if hasattr(val, "shape"):
                # batched entries are sliced per sample; static ones
                # (e.g. faces) are saved as-is
                out_params[key] = np.asarray(val)[bi] if (
                    getattr(val, "ndim", 0) > 0 and val.shape[0] == B
                    and key != "faces"
                ) else np.asarray(val)
            elif isinstance(val, dict):  # measurements
                out_params[key] = {
                    k: np.asarray(v)[bi] for k, v in val.items()
                }
        out_params["proj_joints"] = np.asarray(out["proj_joints"])[bi]
        for key, val in hd_params.items():
            out_params[key] = (
                val[0] if np.ndim(val[0]) else float(val[0])
            )
        np.savez_compressed(
            os.path.join(demo_output_folder, f"{imgname}.npz"),
            **out_params,
        )

    if save_mesh:
        from shapy_tpu.render import save_ply

        save_ply(
            os.path.join(demo_output_folder, f"{imgname}.ply"),
            vertices + hd_params["transl"][0],
            faces,
        )

    if save_vis and full_img is not None:
        # Reference output-file surface (demo.py:253-325): the raw HD
        # image plus, per stage, an RGBA overlay and an [orig|overlay]
        # side-by-side, named {img}_hd_imgs / _hd_{stage}_overlay /
        # _hd_{stage}_cat, with the tab10 per-stage body color.
        import cv2

        from shapy_tpu.render import COLORS, HDRenderer

        hd = HDRenderer()  # lit material + anti-aliased silhouette
        bg = np.transpose(
            np.asarray(full_img, np.float32), (2, 0, 1))[None]

        def write(name, img_chw):
            arr = np.clip(
                np.transpose(img_chw, (1, 2, 0)) * 255, 0, 255
            ).astype(np.uint8)
            code = (cv2.COLOR_RGBA2BGRA if arr.shape[-1] == 4
                    else cv2.COLOR_RGB2BGR)
            cv2.imwrite(os.path.join(demo_output_folder, name),
                        cv2.cvtColor(arr, code))

        write(f"{imgname}_hd_imgs.png", bg[0])
        for si in range(regressor.num_stages):
            key = f"stage_{si:02d}"
            st = out.get(key) or {}
            v = st.get("vertices")
            if v is None:
                continue
            overlay = hd(
                np.asarray(v)[bi:bi + 1], faces,
                focal_length=hd_params["focal_length_in_px"][0:1],
                camera_translation=hd_params["transl"][0:1],
                # principal point = subject bbox center, like the
                # reference's IntrinsicsCamera (plot_utils.py:719-723)
                camera_center=hd_params["center"][0:1],
                bg_imgs=bg, return_with_alpha=True,
                body_color=COLORS.get(key, COLORS["default"]),
            )
            write(f"{imgname}_hd_{key}_overlay.png", overlay[0])
            write(f"{imgname}_hd_{key}_cat.png",
                  np.concatenate([bg[0], overlay[0][:3]], axis=-1))


def build_parser():
    parser = argparse.ArgumentParser(
        description="SHAPY TPU regressor demo",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--exp-cfg", dest="exp_cfgs", nargs="+", default=[])
    parser.add_argument("--exp-opts", dest="exp_opts", nargs="*",
                        default=[])
    parser.add_argument("--output-folder", dest="output_folder",
                        default="demo_output")
    parser.add_argument("--datasets", nargs="+", default=["openpose"])
    # Defaults and truth-parsing match the reference parser exactly
    # (reference demo.py:389-401: default False, `x.lower() in ['true']`)
    # so an unflagged invocation behaves identically.
    parser.add_argument("--save-vis", dest="save_vis", default=False,
                        type=lambda x: str(x).lower() in ("true",))
    parser.add_argument("--save-params", dest="save_params", default=False,
                        type=lambda x: str(x).lower() in ("true",))
    parser.add_argument("--save-mesh", dest="save_mesh", default=False,
                        type=lambda x: str(x).lower() in ("true",))
    parser.add_argument("--split", default="test",
                        choices=["train", "test", "val"])
    parser.add_argument("--batch-size", dest="batch_size", type=int,
                        default=1,
                        help="Images per forward pass. >1 routes through "
                             "the fused on-device crop+normalize path.")
    parser.add_argument("--focal-length", dest="focal_length", type=float,
                        default=DEFAULT_FOCAL_LENGTH,
                        help="Focal length of the weak-perspective camera "
                             "(reference demo.py:386-388).")
    # Accepted for reference CLI compatibility (demo.py:378-382); this
    # demo is headless, so interactive windows are not supported.
    parser.add_argument("--show", default=False,
                        type=lambda x: str(x).lower() in ("true",))
    parser.add_argument("--pause", default=-1, type=float)
    return parser


if __name__ == "__main__":
    from shapy_tpu.utils.config import load_config
    from shapy_tpu.utils.device import (exit_on_device_failure,
        raise_open_file_limit)

    args = build_parser().parse_args()
    cfg = load_config({}, args.exp_cfgs, args.exp_opts)
    raise_open_file_limit()  # reference demo.py:31-32
    exit_on_device_failure()  # reference demo.py:136-139: exit 3
    sys.exit(
        main(
            cfg,
            demo_output_folder=args.output_folder,
            datasets=args.datasets,
            save_vis=args.save_vis,
            save_params=args.save_params,
            save_mesh=args.save_mesh,
            split=args.split,
            batch_size=args.batch_size,
            focal_length=args.focal_length,
        )
    )

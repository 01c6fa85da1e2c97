"""Benchmark: HBW-val-style evaluation throughput on one chip.

Two measurements:

1. **Device throughput** (the headline ``value``): the full SHAPY
   inference pipeline (HRNet-W48 backbone -> 3-stage iterative head ->
   SMPL-X LBS -> virtual measurements: mass, height, plane-slice +
   convex-hull chest/waist/hips) at eval batch size. Timed by chaining
   ``k`` forward passes inside one jitted ``lax.fori_loop`` (each pass's
   output is mixed back into the next input so none can be elided) and
   fetching one scalar at the end — the only methodology that measures
   device time truthfully here, because on tunnelled-TPU setups
   ``block_until_ready`` does not synchronise and per-call dispatch pays
   the tunnel round trip.

2. **End-to-end throughput** (``e2e_images_per_sec``): generated-on-disk
   JPEGs + OpenPose JSONs -> thread-pool DataLoader -> host crop/collate
   -> per-batch jitted forward with an on-device metric accumulator ->
   single final fetch. Includes image decode, crop, and host<->device
   transfer. On a tunnelled dev chip this is dominated by per-dispatch
   HTTP latency (~100 ms/batch), so it undershoots what the same code
   does on locally-attached TPU; both numbers are reported.

Baseline note: the reference publishes no benchmark numbers (BASELINE.md).
``vs_baseline`` divides by an **estimated** 90 images/sec for the
reference PyTorch pipeline on one A100 (HRNet-W48 @ 256x256 fp32 batched
inference + CUDA BVH measurement kernel + per-image CPU scipy convex
hulls). The estimate is bounded by measurements (tools/baseline_bound.py,
round 4, this host):

  * backbone-only A100 fp32 FLOPs bound: HRNet-W48 @ 256x256 is
    ~43.9 GFLOPs/img; at 19.5 TFLOP/s fp32 peak and a generous 40% MFU
    for torch-1.7-era cudnn that is <= 178 img/s BEFORE the CUDA BVH
    kernel, the per-image GPU->CPU syncs and the hull loop;
  * the reference's per-image scipy hull loop measured on REAL example-
    prediction slice geometry: 1.08 ms/img (922 img/s/core) — a real
    serial cost but NOT the bottleneck (the round-3 note saying it was
    is corrected by this measurement);
  * the reference HRNet-W48 fp32 torch forward on this host CPU:
    2792 ms/img (sanity anchor for the FLOPs math).

90 img/s = roughly half the backbone-only bound, absorbing the kernel +
sync + hull stages; the BASELINE.json target is >= 5x A100 on v5e,
i.e. vs_baseline >= 5.
"""

import json
import os
import time

import numpy as np

A100_REFERENCE_IMGS_PER_SEC = 90.0  # estimated, not measured (see above)


def _chained_device_time_ms(body, params, mconsts, x0, ks=(4, 40),
                            reps=3):
    """Per-iteration device time of `body` — see
    shapy_tpu.utils.timing.chained_device_ms for the methodology.

    The on-device reduction matters: fetching any full-sized output
    would drag 100s of MB through the tunnel per timed call (~10 s of
    wall clock with multi-second variance), drowning the measurement.
    The scalar depends on every element of the loop carry, so nothing
    is dead-code-eliminated."""
    import jax
    import jax.numpy as jnp

    from shapy_tpu.utils.timing import chained_device_ms

    @jax.jit
    def run(p, mc, x, k):
        y = jax.lax.fori_loop(0, k, lambda i, x: body(p, mc, x), x)
        return y.mean()

    return chained_device_ms(
        lambda p, mc, x, k: run(p, mc, x, jnp.int32(k)),
        (params, mconsts, x0), ks=ks, reps=reps)


def _make_fake_openpose_tree(root: str, n_images: int, size=(480, 360)):
    """JPEGs + OpenPose JSONs on disk for the end-to-end mode."""
    import cv2

    img_dir = os.path.join(root, "images")
    kp_dir = os.path.join(root, "keypoints")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(kp_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    H, W = size
    for i in range(n_images):
        img = (rng.uniform(size=(H, W, 3)) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(img_dir, f"img{i:04d}.jpg"), img)
        body = np.zeros((25, 3))
        body[:, 0] = rng.uniform(0.2 * W, 0.8 * W, 25)
        body[:, 1] = rng.uniform(0.1 * H, 0.9 * H, 25)
        body[:, 2] = 0.9
        with open(os.path.join(kp_dir, f"img{i:04d}.json"), "w") as f:
            json.dump(
                {"people": [
                    {"pose_keypoints_2d": body.reshape(-1).tolist()}
                ]}, f,
            )


def _e2e_images_per_sec(regressor, batch_size: int, n_images: int) -> dict:
    """End-to-end input-path probes. Returns a dict with:

    * ``loader_only``: images/sec through decode + host warp + collate
      with NO device work — validates the loader is sized to keep up
      with the device throughput;
    * ``e2e_host_crop``: the round-2 path (host f32 crops -> per-batch
      transfer -> jitted forward, ~100 MB/batch at 128);
    * ``e2e_pipelined``: uint8 full images -> device transfer (4x
      smaller) -> fused on-device crop + normalize + forward
      (``apply_from_full_images``), with the NEXT batch device_put while
      the current one computes (double buffering);
    * ``transfer_mb_*``: per-batch host->device payload of each mode,
      to quantify tunnel overhead.
    """
    import tempfile

    import jax
    import jax.numpy as jnp

    from shapy_tpu.data.build import DataLoader, SequentialBatchSampler
    from shapy_tpu.data.crop import crop_to_image_affine
    from shapy_tpu.data.datasets.openpose import OpenPoseDataset
    from shapy_tpu.data.transforms import build_transforms

    results = {}
    with tempfile.TemporaryDirectory(prefix="shapy_bench_") as root:
        _make_fake_openpose_tree(root, n_images)
        transforms = build_transforms({"crop_size": 256}, is_train=False)
        dataset = OpenPoseDataset(
            data_folder=root, img_folder="images", keyp_folder="keypoints",
            transforms=transforms, split="test",
        )

        def collate(samples):
            samples = [s for s in samples if s is not None]
            if not samples:
                return None
            return np.stack([s["cropped_image"] for s in samples])

        def make_loader(ds, coll):
            return DataLoader(
                [ds],
                SequentialBatchSampler(len(ds), batch_size,
                                       drop_last=True),
                coll, num_workers=4, prefetch=4,
            )

        # ---- loader-only probe (decode + warp + collate, no TPU) ----
        loader = make_loader(dataset, collate)
        count = 0
        for batch in loader:  # one warm pass populates OS file cache
            count += batch.shape[0]
        start = time.perf_counter()
        count = 0
        for batch in loader:
            count += batch.shape[0]
        elapsed = time.perf_counter() - start
        results["loader_only"] = count / elapsed if count else 0.0
        results["transfer_mb_host_crop"] = (
            batch_size * 256 * 256 * 3 * 4 / 1e6
        )

        # ---- round-2 style e2e: host f32 crops, serial transfer ----
        mconsts = regressor.model.params

        @jax.jit
        def step(params, mc, acc, images):
            out = regressor.apply(params, images, model_params=mc)
            last = out[f"stage_{regressor.num_stages - 1:02d}"]
            return acc + jnp.sum(last["betas"] ** 2)

        acc = jnp.zeros((), jnp.float32)
        warm = next(iter(loader))
        acc = step(regressor.params, mconsts, acc, jnp.asarray(warm))
        _ = float(acc)

        count = 0
        acc = jnp.zeros((), jnp.float32)
        start = time.perf_counter()
        for batch in loader:
            acc = step(regressor.params, mconsts, acc,
                       jnp.asarray(batch))
            count += batch.shape[0]
        _ = float(acc)  # single final sync
        elapsed = time.perf_counter() - start
        results["e2e_host_crop"] = count / elapsed if count else 0.0

        # ---- pipelined e2e: uint8 full images + fused on-device crop ----
        ds_u8 = OpenPoseDataset(
            data_folder=root, img_folder="images", keyp_folder="keypoints",
            transforms=None, split="test", image_dtype="uint8",
        )

        def collate_u8(samples):
            samples = [s for s in samples if s is not None]
            if not samples:
                return None
            imgs = np.stack([s["image"] for s in samples])  # fixed size
            affines = np.stack([
                crop_to_image_affine(s["center"], s["scale"], (256, 256))
                .astype(np.float32)
                for s in samples
            ])
            return imgs, affines

        @jax.jit
        def step_fused(params, mc, acc, images_u8, affines):
            out = regressor.apply_from_full_images(
                params, images_u8, affines, crop_size=256,
                model_params=mc)
            last = out[f"stage_{regressor.num_stages - 1:02d}"]
            return acc + jnp.sum(last["betas"] ** 2)

        loader_u8 = make_loader(ds_u8, collate_u8)

        # ---- loader-only probe of the PRODUCTION path: the pipelined
        # mode's host-side work is decode + keypoint JSON + affine +
        # uint8 stack (no f32 convert, no host warp, no normalize —
        # those run fused on device). This is the number to compare
        # against device throughput when sizing host cores per chip.
        count = 0
        for batch in loader_u8:  # warm pass: OS file cache
            count += batch[0].shape[0]
        start = time.perf_counter()
        count = 0
        for batch in loader_u8:
            count += batch[0].shape[0]
        elapsed = time.perf_counter() - start
        results["loader_only_pipelined"] = count / elapsed if count else 0.0

        warm = next(iter(loader_u8))
        acc = jnp.zeros((), jnp.float32)
        acc = step_fused(regressor.params, mconsts, acc,
                         jnp.asarray(warm[0]), jnp.asarray(warm[1]))
        _ = float(acc)
        results["transfer_mb_pipelined"] = warm[0].nbytes / 1e6

        count = 0
        acc = jnp.zeros((), jnp.float32)
        start = time.perf_counter()
        pending = None  # device-resident (images, affines) not yet consumed
        for batch in loader_u8:
            # device_put the incoming batch FIRST (async) so its transfer
            # overlaps the step already executing on device.
            nxt = (jax.device_put(batch[0]), jax.device_put(batch[1]))
            if pending is not None:
                acc = step_fused(regressor.params, mconsts, acc,
                                 *pending)
                count += int(pending[0].shape[0])
            pending = nxt
        if pending is not None:
            acc = step_fused(regressor.params, mconsts, acc, *pending)
            count += int(pending[0].shape[0])
        _ = float(acc)
        elapsed = time.perf_counter() - start
        results["e2e_pipelined"] = count / elapsed if count else 0.0
    return results


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship

    batch_size = int(os.environ.get("BENCH_BATCH", "128"))
    # exact_counts: icosphere subdiv 5 refined by edge splits/face drops to
    # EXACTLY the real SMPL-X template sizes (10475 vertices / 20908
    # faces), so LBS + measurement cost is shape-exact, not just
    # scale-matched.
    regressor = _build_flagship(subdivisions=5, exact_counts=True)
    # bf16 backbone (MXU-native), f32 head/LBS/measurements. (An int8
    # backbone was measured and rejected: XLA's int8 conv lowering is
    # 3.7x slower than bf16 on this chip — see BENCH.md.)
    if os.environ.get("BENCH_BF16", "1") == "1":
        regressor.backbone_compute_dtype = jnp.bfloat16

    # Body-model constants as jit ARGUMENTS: closure-captured jax arrays
    # are embedded in the serialized HLO (~100 MB of blend shapes) —
    # slow compiles and oversized tunnel compile requests.
    def body(params, mconsts, images):
        out = regressor.apply(params, images, model_params=mconsts)
        last = out[f"stage_{regressor.num_stages - 1:02d}"]
        mix = last["betas"].mean() + out["proj_joints"].mean()
        mix = mix + sum(
            v.mean()
            for v in jax.tree_util.tree_leaves(out["measurements"])
        )
        return images + mix.astype(images.dtype) * 1e-6

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(batch_size, 256, 256, 3)).astype(np.float32)
    )

    ms = _chained_device_time_ms(
        body, regressor.params, regressor.model.params, images)
    imgs_per_sec = batch_size / ms * 1000.0

    e2e: dict = {}
    if os.environ.get("BENCH_E2E", "1") == "1":
        e2e = _e2e_images_per_sec(
            regressor, batch_size,
            n_images=int(os.environ.get("BENCH_E2E_IMAGES", "512")),
        )

    out = {
        "metric": "hbw_eval_images_per_sec_per_chip",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(
            imgs_per_sec / A100_REFERENCE_IMGS_PER_SEC, 3
        ),
        "vs_baseline_note":
            "baseline is an ESTIMATED 90 img/s A100 figure "
            "(reference publishes no numbers)",
        "timing": "device (chained fori_loop, single fetch)",
        "batch_size": batch_size,
        "e2e_images_per_sec": round(e2e.get("e2e_pipelined", 0.0), 2),
    }
    for k, v in e2e.items():
        out[k] = round(v, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

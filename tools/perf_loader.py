"""Measured loader-throughput vs worker-count curve (VERDICT r3 item 7,
ADVICE rescope). Prints one JSON line.

Note the host topology: this box has ONE CPU core (nproc=1), so the
curve measures thread-overlap on a single core (cv2 decode + warp
release the GIL), not multi-core scaling; the transferable number is
core-milliseconds per image (ms_per_image at the saturating thread
count), which divides into a real host's core count.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from bench import _make_fake_openpose_tree
    from shapy_tpu.data.build import DataLoader, SequentialBatchSampler
    from shapy_tpu.data.datasets.openpose import OpenPoseDataset
    from shapy_tpu.data.transforms import build_transforms

    batch_size = 32
    n_images = 192
    out = {"nproc": os.cpu_count(), "batch_size": batch_size,
           "n_images": n_images}
    with tempfile.TemporaryDirectory(prefix="shapy_loader_") as root:
        _make_fake_openpose_tree(root, n_images)
        transforms = build_transforms({"crop_size": 256}, is_train=False)
        dataset = OpenPoseDataset(
            data_folder=root, img_folder="images",
            keyp_folder="keypoints", transforms=transforms, split="test",
        )

        def collate(samples):
            samples = [s for s in samples if s is not None]
            return (np.stack([s["cropped_image"] for s in samples])
                    if samples else None)

        # warm the OS file cache once
        for _ in DataLoader([dataset],
                            SequentialBatchSampler(len(dataset),
                                                   batch_size, True),
                            collate, num_workers=2, prefetch=2):
            pass

        curve = {}
        for nw in (1, 2, 4, 8):
            loader = DataLoader(
                [dataset],
                SequentialBatchSampler(len(dataset), batch_size,
                                       drop_last=True),
                collate, num_workers=nw, prefetch=4,
            )
            best = 0.0
            for _rep in range(3):
                t0 = time.perf_counter()
                count = 0
                for batch in loader:
                    count += batch.shape[0]
                rate = count / (time.perf_counter() - t0)
                best = max(best, rate)
            curve[nw] = round(best, 2)
        out["images_per_sec_by_workers"] = curve
        sat = max(curve.values())
        out["ms_per_image_at_saturation"] = round(1000.0 / sat, 3)
        out["core_ms_per_image"] = round(
            1000.0 / sat * (os.cpu_count() or 1), 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

from shapy_tpu.data.datasets.openpose import OpenPoseDataset  # noqa: F401

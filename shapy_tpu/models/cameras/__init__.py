from shapy_tpu.models.cameras.projection import (  # noqa: F401
    WeakPerspectiveCamera,
    PerspectiveCamera,
    build_cam_proj,
    DEFAULT_FOCAL_LENGTH,
)

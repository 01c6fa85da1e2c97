from shapy_tpu.ops.plane_slice import plane_slice_triangles  # noqa: F401
from shapy_tpu.ops.convex_hull import (  # noqa: F401
    hull_perimeter_support,
    hull_perimeter_exact_np,
)

from shapy_tpu.ops.plane_slice import plane_slice_triangles  # noqa: F401
from shapy_tpu.ops.convex_hull import (  # noqa: F401
    hull_perimeter_support,
    hull_perimeter_exact_np,
)
from shapy_tpu.ops.tri_tri import (  # noqa: F401
    MeshMeshIntersection,
    mesh_mesh_intersection,
    point_to_barycentric,
)
from shapy_tpu.ops.repulsion import repulsion_loss  # noqa: F401
from shapy_tpu.ops.lbs_pallas import (  # noqa: F401
    lbs_fused,
    lbs_fused_from_rotmats,
    pack_lbs_operands,
)

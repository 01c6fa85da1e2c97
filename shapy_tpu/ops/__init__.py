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
# The fused Pallas LBS kernel (ops/lbs_pallas.py) was DELETED in round 4
# after measurement at the hot shape (batch 128, V=10242, real TPU,
# chained-fori): jnp fwd 0.17 ms vs pallas fwd 0.18 ms (tied within
# noise — XLA already fuses the three contractions well), and the pallas
# path had no reverse-mode autodiff so it could never serve training.
# LBS is 0.3% of the 58 ms eval step; numbers in BENCH.md round-4.

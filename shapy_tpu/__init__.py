"""shapy_tpu — a TPU-native (JAX / XLA / Pallas / pjit) body-shape framework.

A from-scratch rebuild of the capabilities of SHAPY
("Accurate 3D Body Shape Regression using Metric and Semantic Attributes",
CVPR 2022; reference implementation muelea/shapy):

  * SMPL / SMPL-H / SMPL-X differentiable body models (fused LBS on TPU),
  * virtual anthropometric measurements (height, mass, chest/waist/hips
    circumference) via a dense plane-slice + batched convex-hull kernel
    (replacing the reference's CUDA BVH mesh-mesh-intersection extension),
  * shape <-> linguistic-attribute models (A2S / S2A, polynomial + NN +
    probabilistic heads),
  * an HRNet-W48 backbone with an ExPose-style iterative SMPL-X regression
    head, and
  * the HBW / SSP-3D / model-agencies evaluation stack (P2P-20k, V2V,
    measurement errors, per-gender / BMI breakdowns).

Everything on the compute path is jittable, shardable over a
``jax.sharding.Mesh``, and designed MXU-first (big batched matmuls, static
shapes, pad-and-mask instead of data-dependent shapes).
"""

__version__ = "0.1.0"

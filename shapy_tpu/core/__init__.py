from shapy_tpu.core import rotations, kinematics, geometry  # noqa: F401

from shapy_tpu.models.heads.pose_space import (  # noqa: F401
    build_pose_parameterization,
    PoseSpace,
    BlendShapeSpace,
)
from shapy_tpu.models.heads.regressor import (  # noqa: F401
    BodyRegressor,
    SMPLRegressor,
    SMPLHRegressor,
    SMPLXRegressor,
    build_body_head,
    BODY_HEAD_REGISTRY,
)

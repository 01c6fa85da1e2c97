from shapy_tpu.models.body.assets import (  # noqa: F401
    load_model_data,
    make_synthetic_model_data,
    save_model_data,
)
from shapy_tpu.models.body.lbs import lbs  # noqa: F401
from shapy_tpu.models.body.model import (  # noqa: F401
    SMPL,
    SMPLH,
    SMPLX,
    build_body_model,
)

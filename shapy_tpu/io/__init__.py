from shapy_tpu.io.torch_import import (  # noqa: F401
    load_torch_file,
    state_dict_to_numpy,
)
from shapy_tpu.io.export import (  # noqa: F401
    ServingModel,
    export_regressor,
    save_serving_artifact,
)

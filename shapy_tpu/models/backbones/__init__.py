from shapy_tpu.models.backbones.hrnet import (  # noqa: F401
    hrnet_forward,
    hrnet_init,
    HRNET_OUTPUT_DIM,
)
from shapy_tpu.models.backbones.hrnet_import import (  # noqa: F401
    import_hrnet_state_dict,
    load_hrnet_checkpoint,
)
from shapy_tpu.models.backbones.resnet import (  # noqa: F401
    resnet_forward,
    resnet_init,
    import_resnet_state_dict,
)

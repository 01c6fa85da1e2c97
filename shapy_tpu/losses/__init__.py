from shapy_tpu.losses.losses import (  # noqa: F401
    build_loss,
    gmof,
    keypoint_loss,
    vertex_edge_loss,
    rotation_loss,
)
from shapy_tpu.losses.priors import build_prior  # noqa: F401
from shapy_tpu.losses.adversarial import (  # noqa: F401
    LSGANLoss,
    WassersteinGANGP,
    build_adv_loss,
)

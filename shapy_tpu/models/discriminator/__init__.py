from shapy_tpu.models.discriminator.build import (  # noqa: F401
    HMRDiscriminator,
    PoseDiscriminator,
    build_discriminator,
)

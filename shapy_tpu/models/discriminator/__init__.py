from shapy_tpu.models.discriminator.build import (  # noqa: F401
    build_discriminator,
    PoseDiscriminator,
)

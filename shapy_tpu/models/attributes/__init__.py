from shapy_tpu.models.attributes.polynomial import Polynomial  # noqa: F401
from shapy_tpu.models.attributes.constants import (  # noqa: F401
    ATTRIBUTE_NAMES,
    SELF_REPORT_BIAS,
)

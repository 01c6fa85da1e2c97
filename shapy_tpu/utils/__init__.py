from shapy_tpu.utils.config import (  # noqa: F401
    deep_merge,
    load_config,
    parse_dotlist,
    parse_args,
)
from shapy_tpu.utils.timer import Timer  # noqa: F401
from shapy_tpu.utils.logging import get_logger  # noqa: F401

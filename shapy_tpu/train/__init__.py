from shapy_tpu.train.losses import RegressorLosses  # noqa: F401
from shapy_tpu.train.step import (  # noqa: F401
    TrainState,
    build_optimizer,
    make_train_step,
)

"""L4 training driver: jit'd train step, epoch loop, checkpoint/resume."""

from sert_tpu.train.step import TrainState, make_optimizer, make_train_step  # noqa: F401
from sert_tpu.train.checkpoint import (  # noqa: F401
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from sert_tpu.train.loop import train  # noqa: F401

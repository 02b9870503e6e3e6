"""Training subsystem: jitted steps, schedules, checkpointing."""

from deepsensornz_tpu.train.trainer import (  # noqa: F401
    Trainer,
    TrainState,
    make_train_step,
    train_epoch,
    make_eval_step,
    PlateauScheduler,
    EarlyStopping,
)
from deepsensornz_tpu.train.checkpoint import save_checkpoint, load_checkpoint  # noqa: F401

"""Training loops, schedules, checkpointing."""

from avatarcap_tpu.train.schedules import get_learning_rate_schedule  # noqa: F401
from avatarcap_tpu.train.trainer import (  # noqa: F401
    AvatarTrainer, TrainState)

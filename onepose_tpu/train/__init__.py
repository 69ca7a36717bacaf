"""Training runtime: losses, optimization, SPMD train/eval steps."""

from onepose_tpu.train.losses import focal_loss
from onepose_tpu.train.train_step import (
    TrainConfig,
    create_train_state,
    make_train_step,
    make_eval_step,
)

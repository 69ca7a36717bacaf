"""Utilities: checkpointing, profiling, logging glue."""

from onepose_tpu.utils.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    latest_checkpoint,
)
from onepose_tpu.utils.profiling import StageTimer

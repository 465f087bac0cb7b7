"""Training runtime: loss, train state/steps, checkpointing, logging."""

from tacotron2_tpu.training.loss import LossBreakdown, tacotron2_loss
from tacotron2_tpu.training.state import (
    Batch, StepMetrics, TrainState, create_train_state, eval_step,
    make_optimizer, train_step,
)

__all__ = [
    "LossBreakdown", "tacotron2_loss", "Batch", "StepMetrics", "TrainState",
    "create_train_state", "eval_step", "make_optimizer", "train_step",
]

"""Training machinery: optimizer, state, fused steps, checkpointing."""

from .optim import build_optimizer, make_lr_schedule, weight_decay_mask
from .state import TrainState
from .step import (
    create_train_state,
    make_eval_step,
    make_loss_fn,
    make_train_step,
    simcc_loss,
)

__all__ = [
    "TrainState",
    "build_optimizer",
    "create_train_state",
    "make_eval_step",
    "make_loss_fn",
    "make_lr_schedule",
    "make_train_step",
    "simcc_loss",
    "weight_decay_mask",
]

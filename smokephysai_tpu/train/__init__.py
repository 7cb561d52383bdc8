from .loop import TrainState, create_train_state, eval_step, fit, train_step
from .checkpoint import latest_checkpoint, restore_checkpoint, save_checkpoint
from . import metrics

__all__ = [
    "TrainState",
    "create_train_state",
    "train_step",
    "eval_step",
    "fit",
    "save_checkpoint",
    "restore_checkpoint",
    "latest_checkpoint",
    "metrics",
]

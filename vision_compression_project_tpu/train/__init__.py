from .train_step import TrainState, make_train_state, train_step, vlm_loss
from .checkpoint import save_checkpoint, restore_checkpoint

__all__ = [
    "TrainState",
    "make_train_state",
    "train_step",
    "vlm_loss",
    "save_checkpoint",
    "restore_checkpoint",
]

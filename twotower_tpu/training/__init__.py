"""Training layer: optimizer, train state, jitted step, epoch loop."""

from twotower_tpu.training.loop import EarlyStopping, Trainer, TrainResult, make_train_step
from twotower_tpu.training.state import TrainState, make_optimizer

__all__ = [
    "Trainer",
    "TrainResult",
    "TrainState",
    "EarlyStopping",
    "make_optimizer",
    "make_train_step",
]

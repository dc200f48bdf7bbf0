"""Training runtime: losses, sharded train step, checkpointing, validation."""
from .losses import oetr_losses, total_loss
from .train import (TrainState, create_train_state, load_checkpoint,
                    make_optimizer, make_train_step, multistep_schedule,
                    save_checkpoint)
from .validation import evaluate

__all__ = [
    "oetr_losses", "total_loss", "TrainState", "create_train_state",
    "load_checkpoint", "make_optimizer", "make_train_step",
    "multistep_schedule", "save_checkpoint", "evaluate",
]

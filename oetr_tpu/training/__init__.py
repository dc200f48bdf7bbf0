"""Training runtime: losses, sharded train step, checkpointing, validation."""
from .losses import (cycle_overlap_loss, interpolate_depth, oetr_losses,
                     total_loss, warped_box_via_depth)
from .train import (TrainState, create_train_state, load_checkpoint,
                    make_optimizer, make_train_step, multistep_schedule,
                    save_checkpoint, shard_train_state)
from .validation import evaluate

__all__ = [
    "cycle_overlap_loss", "interpolate_depth", "oetr_losses", "total_loss",
    "warped_box_via_depth", "TrainState", "create_train_state",
    "load_checkpoint", "make_optimizer", "make_train_step",
    "multistep_schedule", "save_checkpoint", "shard_train_state", "evaluate",
    "make_superglue_train_step", "superglue_nll_loss",
    "corners_to_cell_labels", "magicpoint_loss",
    "make_superpoint_train_step", "synthetic_shapes_batch",
    "loftr_coarse_loss", "make_loftr_train_step", "shift_pair_gt",
]
from .superglue import (make_superglue_train_step,  # noqa: E402,F401
                        superglue_nll_loss)
from .superpoint import (corners_to_cell_labels,  # noqa: E402,F401
                         magicpoint_loss, make_superpoint_train_step,
                         synthetic_shapes_batch)
from .loftr import (loftr_coarse_loss, make_loftr_train_step,  # noqa: E402,F401
                    shift_pair_gt)

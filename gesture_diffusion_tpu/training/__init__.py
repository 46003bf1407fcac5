from .lr_schedule import build_lr_schedule, noam_xf_schedule, noam_decay_schedule
from .train_state import TrainState, assemble_losses, init_opt_state, wasserstein_distance_1d
from .trainer import Trainer, make_train_multi_step, make_train_step, make_val_step
from .data import ArrayDataset, iter_batches, steps_per_epoch
from .checkpoint import save_checkpoint, load_checkpoint, checkpoint_path
from .metrics import MetricsLogger

__all__ = [
    "build_lr_schedule", "noam_xf_schedule", "noam_decay_schedule",
    "TrainState", "assemble_losses", "init_opt_state", "wasserstein_distance_1d",
    "Trainer", "make_train_multi_step", "make_train_step", "make_val_step",
    "ArrayDataset", "iter_batches", "steps_per_epoch",
    "save_checkpoint", "load_checkpoint", "checkpoint_path",
    "MetricsLogger",
]

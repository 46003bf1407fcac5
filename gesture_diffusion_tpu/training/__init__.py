from .lr_schedule import build_lr_schedule, noam_xf_schedule, noam_decay_schedule

__all__ = ["build_lr_schedule", "noam_xf_schedule", "noam_decay_schedule"]

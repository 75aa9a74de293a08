from .augmentations import xray_augmentations
from .checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    restore_into,
    save_checkpoint,
)
from .loss import pose_regression_loss
from .sampler import get_random_pose
from .schedule import identity_schedule, warmup_cosine_schedule
from .trainer import Trainer

__all__ = [
    "Trainer",
    "get_random_pose",
    "identity_schedule",
    "latest_checkpoint",
    "load_checkpoint",
    "pose_regression_loss",
    "restore_into",
    "save_checkpoint",
    "warmup_cosine_schedule",
    "xray_augmentations",
]

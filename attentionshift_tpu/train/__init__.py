from .checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    restore_params,
    save_checkpoint,
    save_params,
)
from .optim import (
    build_optimizer,
    lr_scale_tree,
    step_lr_schedule,
    vit_layer_id,
    weight_decay_mask,
)
from .state import TrainState
from .step import make_eval_step, make_train_step

__all__ = [
    "latest_checkpoint",
    "restore_checkpoint",
    "restore_params",
    "save_checkpoint",
    "save_params",
    "build_optimizer",
    "lr_scale_tree",
    "step_lr_schedule",
    "vit_layer_id",
    "weight_decay_mask",
    "TrainState",
    "make_eval_step",
    "make_train_step",
]

from .ema import ema_update, make_train_step_ts

__all__ += ["ema_update", "make_train_step_ts"]

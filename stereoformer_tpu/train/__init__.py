"""Training layer: jitted SPMD steps, trainer orchestration, schedules,
checkpoints."""

from .checkpoint import (
    finalize_checkpoints,
    latest_checkpoint,
    migrate_gate_fusion,
    restore_checkpoint,
    restore_params,
    save_checkpoint,
)
from .params import (
    count_parameters,
    freeze_offsets,
    masked_optimizer,
    only_offsets,
)
from .schedule import make_step_schedule, reference_lr
from .state import TrainState
from .steps import compute_loss, make_eval_step, make_infer_fn, make_train_step
from .trainer import DisparityTrainer

__all__ = [
    "count_parameters",
    "freeze_offsets",
    "masked_optimizer",
    "only_offsets",
    "finalize_checkpoints",
    "latest_checkpoint",
    "restore_checkpoint",
    "migrate_gate_fusion",
    "restore_params",
    "save_checkpoint",
    "make_step_schedule",
    "reference_lr",
    "TrainState",
    "compute_loss",
    "make_eval_step",
    "make_infer_fn",
    "make_train_step",
    "DisparityTrainer",
]

from .builder import RUNNERS, build_runner
from .optim import OPTIMIZERS, build_optimizer, build_lr_schedule
from .train_state import TrainState
from .hooks import (
    HOOKS,
    Hook,
    TextLoggerHook,
    CheckpointHook,
    IterTimerHook,
    EvalHook,
    build_hook,
)
from .base_runner import BaseRunner
from .epoch_based_runner import EpochBasedRunner
from .iter_based_runner import IterBasedRunner
from .state_machine_runner import StateMachineRunner
from .gan2shape_runner import Gan2ShapeRunner
from . import hooks_extra  # noqa: F401  (register)
from .checkpoint import save_checkpoint, load_checkpoint

__all__ = [
    "RUNNERS",
    "build_runner",
    "OPTIMIZERS",
    "build_optimizer",
    "build_lr_schedule",
    "TrainState",
    "HOOKS",
    "Hook",
    "TextLoggerHook",
    "CheckpointHook",
    "IterTimerHook",
    "EvalHook",
    "build_hook",
    "BaseRunner",
    "EpochBasedRunner",
    "IterBasedRunner",
    "StateMachineRunner",
    "Gan2ShapeRunner",
    "save_checkpoint",
    "load_checkpoint",
]

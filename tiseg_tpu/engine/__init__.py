from .optim import build_lr_schedule, build_optimizer
from .train_state import TrainState, make_train_step, make_eval_step
from .checkpoint import CheckpointManager
from .runner import EpochBasedRunner, IterBasedRunner, effective_interval, LogBuffer

__all__ = [
    'build_lr_schedule', 'build_optimizer', 'TrainState', 'make_train_step', 'make_eval_step', 'CheckpointManager',
    'EpochBasedRunner', 'IterBasedRunner', 'effective_interval', 'LogBuffer'
]

from .ema import EMAState, ema_init, ema_update
from .optim import build_optimizer, warmup_cosine_epochwise
from .trainer import (
    TrainState,
    compile_train_step,
    create_train_state,
    make_train_step,
    shard_train_state,
)
from .checkpoint import CheckpointManager, resolve_resume_path

__all__ = [
    "EMAState", "ema_init", "ema_update",
    "build_optimizer", "warmup_cosine_epochwise",
    "TrainState", "compile_train_step", "create_train_state",
    "make_train_step", "shard_train_state",
    "CheckpointManager", "resolve_resume_path",
]

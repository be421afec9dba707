from .config import (
    Config,
    DataConfig,
    DiffusionConfig,
    ModelConfig,
    OptimizerConfig,
    OrdinalEmbedderConfig,
    SchedulerConfig,
    TrainingConfig,
    load_config,
)
from .precision import Policy, DEFAULT_POLICY, FP32_POLICY

__all__ = [
    "Config",
    "DataConfig",
    "DiffusionConfig",
    "ModelConfig",
    "OptimizerConfig",
    "OrdinalEmbedderConfig",
    "SchedulerConfig",
    "TrainingConfig",
    "load_config",
    "Policy",
    "DEFAULT_POLICY",
    "FP32_POLICY",
]

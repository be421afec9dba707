from .schedule import NoiseSchedule, ddim_timesteps
from .sampler import SamplerConfig, cfg_eps_fn, ddim_sample, dpm_sample
from .dadd import DADD, DADDCore, DADDCoreConfig, core_config_from

__all__ = [
    "NoiseSchedule",
    "ddim_timesteps",
    "SamplerConfig",
    "cfg_eps_fn",
    "ddim_sample",
    "dpm_sample",
    "DADD",
    "DADDCore",
    "DADDCoreConfig",
    "core_config_from",
]

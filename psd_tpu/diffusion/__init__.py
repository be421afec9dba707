from .schedule import NoiseSchedule, ddim_timesteps
from .sampler import SamplerConfig, ddim_sample

__all__ = ["NoiseSchedule", "ddim_timesteps", "SamplerConfig", "ddim_sample"]

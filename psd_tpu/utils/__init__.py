from .fast_init import enable_compile_cache, fast_init
from .image_io import AsyncImageWriter, progression_grid, save_image, save_sequence
from .logging import MetricLogger
from .profiling import PhaseTimer, annotate, trace_if

__all__ = [
    "enable_compile_cache", "fast_init",
    "AsyncImageWriter", "progression_grid", "save_image", "save_sequence",
    "MetricLogger",
    "PhaseTimer", "annotate", "trace_if",
]

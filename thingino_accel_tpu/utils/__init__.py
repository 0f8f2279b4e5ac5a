"""Utilities: timing/profiling, logging, config registry."""

from thingino_accel_tpu.utils.timing import (
    time_fn, time_fn_chained, throughput, profile_trace, compiled_stats,
)
from thingino_accel_tpu.utils.logging import get_logger
from thingino_accel_tpu.utils.cache import enable_compile_cache
from thingino_accel_tpu.utils import config

__all__ = ["time_fn", "time_fn_chained", "throughput", "profile_trace",
           "compiled_stats", "get_logger", "config", "enable_compile_cache"]

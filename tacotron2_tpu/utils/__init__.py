"""Shared utilities: profiling, debugging."""

from tacotron2_tpu.utils.profiling import (
    StepTimer, profile_trace, start_profiler_server,
)

__all__ = ["StepTimer", "profile_trace", "start_profiler_server"]

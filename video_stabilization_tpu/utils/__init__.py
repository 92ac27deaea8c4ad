"""Utilities: timing/profiling, logging."""

from video_stabilization_tpu.utils.timing import honest_time, StageTimer  # noqa: F401

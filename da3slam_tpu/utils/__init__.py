"""Shared utilities: profiling, timers."""

from da3slam_tpu.utils.profiling import StageTimer, profile_trace  # noqa: F401

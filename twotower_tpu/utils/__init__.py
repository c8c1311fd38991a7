"""Utilities: checkpointing, experiment tracking."""

from twotower_tpu.utils.checkpoint import CheckpointManager
from twotower_tpu.utils.tracking import (
    JsonlWriter,
    MetricWriter,
    StdoutWriter,
    build_writers,
)

__all__ = [
    "CheckpointManager",
    "JsonlWriter",
    "MetricWriter",
    "StdoutWriter",
    "build_writers",
]

"""Tracing/profiling + failure-handling utilities.

The reference has neither profiling nor failure recovery (SURVEY.md §5.1,
§5.3: no profiler hooks, no retries, no elasticity). TPU-native equivalents:

- ``trace(logdir)``: ``jax.profiler`` trace context — produces a TensorBoard-
  loadable device trace (XLA op timeline, HBM usage) for any code region.
- ``StepTimer``: lightweight host-side step timing with percentile summary,
  cheap enough to leave on in production loops.
- ``GracefulShutdown``: SIGTERM/SIGINT handler for preemption-aware training
  — the loop checks ``should_stop`` each epoch and checkpoints before exit
  (TPU pods are preemptible; this is the elastic-recovery primitive).
"""

from __future__ import annotations

import contextlib
import signal
import time
from pathlib import Path

import numpy as np

from twotower_tpu.logging_utils import get_logger

logger = get_logger(__name__)


@contextlib.contextmanager
def trace(logdir: str | Path | None):
    """``jax.profiler`` trace over a code region; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    import jax

    logdir = str(logdir)
    Path(logdir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(logdir)
    logger.info("profiler trace started -> %s", logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", logdir)


class StepTimer:
    """Rolling step-duration stats (p50/p90/p99) over a bounded window."""

    def __init__(self, window: int = 1000):
        self.window = window
        self._durations: list[float] = []
        self._last: float | None = None

    def tick(self) -> float | None:
        """Mark a step boundary; returns the completed step's duration."""
        now = time.perf_counter()
        dur = None
        if self._last is not None:
            dur = now - self._last
            self._durations.append(dur)
            if len(self._durations) > self.window:
                self._durations = self._durations[-self.window :]
        self._last = now
        return dur

    def summary(self) -> dict[str, float]:
        if not self._durations:
            return {}
        arr = np.asarray(self._durations)
        return {
            "step_time_p50_ms": float(np.percentile(arr, 50) * 1000),
            "step_time_p90_ms": float(np.percentile(arr, 90) * 1000),
            "step_time_p99_ms": float(np.percentile(arr, 99) * 1000),
            "step_time_mean_ms": float(arr.mean() * 1000),
        }


class GracefulShutdown:
    """Install-once SIGTERM/SIGINT trap; training loops poll ``should_stop``.

    The first signal requests a clean stop (finish the epoch, checkpoint);
    a second signal restores default handling (hard exit).
    """

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self.should_stop = False
        self._signals = signals
        self._previous: dict[int, object] = {}

    def install(self) -> "GracefulShutdown":
        for sig in self._signals:
            self._previous[sig] = signal.signal(sig, self._handle)
        return self

    def _handle(self, signum, frame) -> None:
        if self.should_stop:  # second signal: restore default and re-raise
            signal.signal(signum, self._previous.get(signum, signal.SIG_DFL))
            raise KeyboardInterrupt
        logger.warning(
            "received signal %s: finishing epoch then checkpointing", signum
        )
        self.should_stop = True

    def uninstall(self) -> None:
        for sig, prev in self._previous.items():
            signal.signal(sig, prev)
        self._previous.clear()

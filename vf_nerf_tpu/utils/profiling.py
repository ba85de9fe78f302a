"""Tracing / profiling / debug hooks.

The reference has none of these (SURVEY.md §5.1-5.2: tqdm + prints only, and
a commented-out anomaly-detection line, ``utils/utils.py:167``). TPU-native
observability:

- ``trace()``: ``jax.profiler`` trace context (view in TensorBoard /
  xprof), enabled by ``VFNERF_PROFILE_DIR`` or an explicit path,
- ``StepTimer``: rolling step timing → rays/sec, the north-star metric
  (SURVEY.md §5.1),
- ``maybe_enable_nan_debugging()``: jit-level NaN checks behind the
  ``VFNERF_DEBUG_NANS`` env flag (SURVEY.md §5.2).
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import deque
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """jax.profiler trace when a directory is configured; no-op otherwise."""
    log_dir = log_dir or os.environ.get("VFNERF_PROFILE_DIR")
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield


def maybe_enable_nan_debugging() -> bool:
    """Enable jax_debug_nans when VFNERF_DEBUG_NANS is set (slow; aborts on
    the first NaN-producing op inside jit)."""
    if os.environ.get("VFNERF_DEBUG_NANS", "") not in ("", "0", "false"):
        import jax
        jax.config.update("jax_debug_nans", True)
        return True
    return False


class StepTimer:
    """Rolling window step timer reporting rays/sec."""

    def __init__(self, window: int = 50) -> None:
        self._durations: deque = deque(maxlen=window)
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._durations.append(now - self._last)
        self._last = now

    def seconds_per_step(self) -> float:
        if not self._durations:
            return float("nan")
        return sum(self._durations) / len(self._durations)

    def rays_per_sec(self, rays_per_step: int) -> float:
        s = self.seconds_per_step()
        return rays_per_step / s if s and s > 0 else float("nan")

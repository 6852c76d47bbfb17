"""Tracing / profiling (SURVEY.md §5 "Tracing / profiling").

The reference has only HF-Trainer tensorboard scalars; here:
  * `trace(log_dir)` — context manager around `jax.profiler` capturing a
    device trace viewable in TensorBoard/Perfetto/XProf;
  * `StepTimer` — wall-clock per-step stats with tokens/s, the metric the
    north star reports (tokens/s/chip at 1 chip / 1 host / N hosts);
  * `annotate(name)` — TraceAnnotation wrapper for labeling step phases.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a region in the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling per-step timing: call ``tick(tokens)`` once per step."""

    def __init__(self, warmup_steps: int = 2):
        self.warmup = warmup_steps
        self.reset()

    def reset(self):
        self._count = 0
        self._tokens = 0
        self._elapsed = 0.0
        self._last: Optional[float] = None

    def tick(self, tokens: int = 0) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._count += 1
            if self._count > self.warmup:
                self._elapsed += now - self._last
                self._tokens += tokens
        self._last = now

    @property
    def steps_timed(self) -> int:
        return max(self._count - self.warmup, 0)

    def summary(self) -> Dict[str, float]:
        n = self.steps_timed
        if n == 0 or self._elapsed == 0:
            return {"step_time_s": float("nan"), "tokens_per_s": 0.0}
        per_chip = max(len(jax.devices()), 1)
        return {
            "step_time_s": self._elapsed / n,
            "tokens_per_s": self._tokens / self._elapsed,
            "tokens_per_s_per_chip": self._tokens / self._elapsed / per_chip,
        }

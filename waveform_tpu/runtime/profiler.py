"""Frame profiler: throughput, latency percentiles, and the FFTW MFLOPS metric.

FFTW's harness times candidate plans with hardware cycle counters and
reports MFLOPS = 5·N·log2(N)/t for complex transforms, 2.5·N·log2(N)/t for
real ones (/root/reference/deps/fftw-3.3.11/libbench2/mflops.c:20-27).  The
same definitions are kept here for comparability, plus the serving metrics
the plugin never had: frames/s and p50/p99 buffer→spectrum latency
(BASELINE.md north-star line 3).

``jax.profiler`` traces can be captured around any window for XLA-level
analysis (the planner-measurement analog, SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import math
import time
from dataclasses import dataclass, field

import numpy as np


def fft_mflops(n: int, seconds: float, real_input: bool = True,
               count: int = 1) -> float:
    """FFTW's benchmark metric (libbench2/mflops.c:20-27)."""
    ops = (2.5 if real_input else 5.0) * n * math.log2(n) * count
    return ops / (seconds * 1e6)


@dataclass
class FrameProfiler:
    """Rolling per-tick statistics for a serving engine."""

    num_streams: int
    fft_size: int
    window: int = 600            # ticks of history
    _durations: list = field(default_factory=list)
    _t0: float | None = None

    def tick_start(self) -> None:
        self._t0 = time.perf_counter()

    def tick_end(self) -> None:
        if self._t0 is None:
            return
        self._durations.append(time.perf_counter() - self._t0)
        self._t0 = None
        if len(self._durations) > self.window:
            del self._durations[:len(self._durations) - self.window]

    @contextlib.contextmanager
    def tick(self):
        self.tick_start()
        try:
            yield
        finally:
            self.tick_end()

    def stats(self) -> dict:
        if not self._durations:
            return {}
        d = np.asarray(self._durations)
        per_tick = float(d.mean())
        return {
            "ticks": len(d),
            "ms_per_tick": per_tick * 1e3,
            "frames_per_sec": self.num_streams / per_tick,
            "p50_ms": float(np.percentile(d, 50)) * 1e3,
            "p99_ms": float(np.percentile(d, 99)) * 1e3,
            "fft_mflops": fft_mflops(self.fft_size, per_tick,
                                     real_input=True,
                                     count=self.num_streams),
        }


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (XLA-level planner measurement analog)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

"""Named-phase profiler + JSON report.

Real implementation of the reference's IProfiler interface
(include/core/interfaces.hpp:107-116: start_timer/stop_timer/get_timer/
get_all_timers/print_summary), which the reference declares but never
implements (SimulationContext sets profiler_=nullptr,
src/core/simulation_context.cpp:33). Also emits the `profiling_report.json`
the reference's config promises (basic_lambda_cdm.json profiling block).

Device-aware: `block=True` calls `jax.block_until_ready` on a sentinel so
timings measure actual device work, not dispatch.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass


@dataclass
class TimerStats:
    count: int = 0
    total_s: float = 0.0
    min_s: float = float("inf")
    max_s: float = 0.0

    def add(self, dt: float) -> None:
        self.count += 1
        self.total_s += dt
        self.min_s = min(self.min_s, dt)
        self.max_s = max(self.max_s, dt)

    @property
    def mean_s(self) -> float:
        return self.total_s / self.count if self.count else 0.0

    def to_dict(self) -> dict:
        return {"count": self.count, "total_s": self.total_s,
                "mean_s": self.mean_s, "min_s": self.min_s,
                "max_s": self.max_s}


class Profiler:
    """Named timers (IProfiler capability, interfaces.hpp:107-116)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.timers: dict[str, TimerStats] = {}
        self._open: dict[str, float] = {}

    def start(self, name: str) -> None:
        if self.enabled:
            self._open[name] = time.perf_counter()

    def stop(self, name: str, sync_on=None) -> float:
        if not self.enabled or name not in self._open:
            return 0.0
        if sync_on is not None:
            import jax
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - self._open.pop(name)
        self.timers.setdefault(name, TimerStats()).add(dt)
        return dt

    @contextlib.contextmanager
    def timer(self, name: str, sync_on=None):
        self.start(name)
        try:
            yield
        finally:
            self.stop(name, sync_on=sync_on)

    def get(self, name: str) -> TimerStats:
        return self.timers.get(name, TimerStats())

    def summary(self) -> dict:
        return {k: v.to_dict() for k, v in sorted(self.timers.items())}

    def print_summary(self) -> None:
        print(f"{'phase':<28}{'count':>8}{'total[s]':>12}{'mean[ms]':>12}")
        for name, t in sorted(self.timers.items()):
            print(f"{name:<28}{t.count:>8}{t.total_s:>12.4f}"
                  f"{t.mean_s * 1e3:>12.4f}")

    def reset(self) -> None:
        self.timers.clear()
        self._open.clear()

    def write_report(self, path: str, extra: dict | None = None) -> None:
        """Emit profiling_report.json (config promise,
        basic_lambda_cdm.json:169-175)."""
        report = {"timers": self.summary()}
        if extra:
            report.update(extra)
        with open(path, "w") as f:
            json.dump(report, f, indent=2)


@contextlib.contextmanager
def jax_trace(log_dir: str):
    """Wrap a region in a jax.profiler trace (TensorBoard-viewable) --
    the TPU-native analogue of the reference's unused cuda_profiler_api
    include (lambda_cdm_kernels.cu:1)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

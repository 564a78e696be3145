"""Tracing / profiling / numerics-debug helpers (SURVEY.md §5.1-5.2).

The reference has only CUDA-event timing and an autograd anomaly flag;
the TPU-native equivalents are jax.profiler XPlane traces (viewable in
TensorBoard/XProf), named trace annotations per phase, a host-side step
timer, and jax debug_nans/checkify toggles.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace_annotation(name: str):
    """Named region in the profiler timeline (device + host)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def capture_trace(log_dir: str):
    """Capture an XPlane trace for everything inside the context:
    `tensorboard --logdir <log_dir>` renders the timeline."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_checks(enable: bool = True):
    """Fail fast on NaNs from any jitted computation (the reference's
    --detect_anomaly analogue; SURVEY.md §5.2)."""
    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    """Rolling wall-clock stats for the host loop (per-phase totals)."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def time(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "mean_ms": round(
                    1e3 * self.totals[name] / max(self.counts[name], 1), 3
                ),
                "count": self.counts[name],
            }
            for name in self.totals
        }

"""Timing / throughput observability.

The reference's entire telemetry is two wall-clock printlns (main.rs:48-67);
here: scoped timers, a PBS counter (the north-star kernel metric), and an
optional jax.profiler trace context for TPU timeline capture.
"""

from __future__ import annotations

import contextlib
import time


class Metrics:
    """Process-wide counters: PBS-class bootstraps, WoPBS calls, timings."""

    def __init__(self):
        self.counters: dict[str, float] = {}

    def add(self, name: str, value: float = 1.0) -> None:
        self.counters[name] = self.counters.get(name, 0.0) + value

    def pbs_rate(self, seconds: float) -> float:
        return self.counters.get("pbs", 0.0) / max(seconds, 1e-9)

    def summary(self) -> dict[str, float]:
        return dict(self.counters)


METRICS = Metrics()


@contextlib.contextmanager
def timer(name: str, metrics: Metrics = METRICS, verbose: bool = False):
    t0 = time.time()
    yield
    dt = time.time() - t0
    metrics.add(f"time/{name}", dt)
    if verbose:
        print(f"[timer] {name}: {dt:.3f}s")


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """jax.profiler trace (TensorBoard-compatible) when log_dir is given."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def count_pbs_per_block(params) -> int:
    """CBS-class bootstraps per AES-128 CTR block in this framework:
    128 bits x 10 rounds (encrypt) + 16 ripple steps x 9 bits (add_scalar).
    The reference's extract-bits PBS cost is zero here (1-bit blocks ->
    keyswitch only, SURVEY.md 2b)."""
    return 128 * 10 + 16 * 9

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


def device_fence(x):
    """Honest completion fence for timing: block_until_ready PLUS a tiny
    device->host read.  Tunneled TPU backends (axon) have returned from
    block_until_ready at enqueue time; a D2H read of one element cannot
    complete before the producing program does."""
    import numpy as np
    import jax
    jax.block_until_ready(x)
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[-1:]))
    return x


def count_pbs_per_block(params) -> int:
    """PBS-class bootstraps per AES-128 CTR block in this framework.

    The ONE accounting used by cli.py and bench.py.  Each circuit-bootstrapped
    bit costs ``cbs_level`` blind rotates; bit extraction costs zero PBS here
    (1-bit radix blocks degenerate to a keyswitch, SURVEY.md 2b):
      encrypt: 10 rounds x 128 bits; add_scalar ripple: 8 + 15 x 9 bits."""
    return (10 * 128 + 8 + 15 * 9) * params.cbs_level

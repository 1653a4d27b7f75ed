"""Tracing/profiling hooks (SURVEY §5.1: absent in the reference; the
framework's north-star metric is 1-s windows/sec/chip, so first-class here).

* `trace(logdir)` — jax.profiler trace capture around any block; view with
  TensorBoard or xprof.
* `Throughput` — windows/sec counter with simple aggregation, used by
  bench.py and available to the inference engine.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str | None):
    """jax.profiler trace when logdir is set; no-op otherwise."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Accumulating items/sec counter.

    >>> tp = Throughput("windows")
    >>> with tp.measure(n_windows):
    ...     run()
    >>> tp.rate()
    """

    def __init__(self, unit: str = "items"):
        self.unit = unit
        self.items = 0
        self.seconds = 0.0

    @contextlib.contextmanager
    def measure(self, n: int):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.seconds += time.perf_counter() - t0
            self.items += n

    def rate(self) -> float:
        return self.items / self.seconds if self.seconds else 0.0

    def report(self) -> str:
        return (f"{self.items} {self.unit} in {self.seconds:.2f}s "
                f"= {self.rate():.1f} {self.unit}/s")

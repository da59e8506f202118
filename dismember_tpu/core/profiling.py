"""Profiling & observability helpers.

The reference times everything with nanoTime logs (SURVEY.md §5); here the
same structured counters exist plus proper device traces via jax.profiler —
open the dump with TensorBoard or xprof.
"""

from __future__ import annotations

import contextlib
import logging
import time

logger = logging.getLogger("dismember_tpu.profiling")


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for the enclosed block (jax.profiler)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Throughput counter: examples/s and queries/s with periodic logs.

    Mirrors the reference's progress strings (epoch time, count/total,
    iteration time — tdm LocalOptimizer.scala:210-227) in a reusable form.
    """

    def __init__(self, name: str, log_every: int = 100):
        self.name = name
        self.log_every = log_every
        self.count = 0
        self.items = 0
        self.t0 = time.perf_counter()
        self.last = self.t0

    def step(self, n_items: int) -> None:
        self.count += 1
        self.items += n_items
        if self.log_every and self.count % self.log_every == 0:
            now = time.perf_counter()
            rate = self.items / (now - self.t0)
            logger.info(
                f"{self.name}: step {self.count}, {rate:,.0f} items/s "
                f"(last {self.log_every}: "
                f"{self.log_every * n_items / (now - self.last):,.0f}/s)"
            )
            self.last = now

    @property
    def rate(self) -> float:
        return self.items / max(time.perf_counter() - self.t0, 1e-9)

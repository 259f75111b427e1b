"""Tracing / profiling harness (SURVEY §5.1 — strictly more than parity).

The reference's only instrumentation is ``clock()`` around ``lm.minimize``
(bench/bench_sparse_qr_extra.cpp:310-352).  Here:

* :func:`timed` — wall-clock a device computation correctly (blocks on the
  result, returns (value, seconds)).
* :class:`Timer` — accumulating named-section timer for driver loops.
* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-compatible device trace when available.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any, Callable, Dict, Tuple

import jax

__all__ = ["timed", "Timer", "trace"]


def timed(fn: Callable, *args, **kwargs) -> Tuple[Any, float]:
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    out = jax.block_until_ready(out)
    return out, time.perf_counter() - t0


class Timer:
    """Accumulating section timer: ``with timer("factorize"): ...``."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:30s} {t * 1e3:10.2f} ms total  {c:6d} calls  {t / c * 1e3:8.3f} ms/call")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """Device trace via jax.profiler (viewable in TensorBoard / Perfetto)."""
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass

"""Tracing / profiling harness (SURVEY §5.1 — strictly more than parity).

The reference's only instrumentation is ``clock()`` around ``lm.minimize``
(bench/bench_sparse_qr_extra.cpp:310-352).  Here:

* :func:`timed` — wall-clock a device computation correctly (blocks on the
  result, returns (value, seconds)).
* :class:`Timer` — accumulating named-section timer for driver loops.
* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-compatible device trace when available.
* :func:`count_dispatches` — context manager counting compiled-program
  executions, the unit that costs one host↔device round trip on a remote
  accelerator tunnel.  The fused paths advertise O(1)-dispatch behavior;
  tests pin it with this counter so a regression fails loudly instead of
  silently costing ~31 ms per extra dispatch.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any, Callable, Dict, Tuple

import jax

__all__ = ["timed", "Timer", "trace", "count_dispatches", "DispatchCount"]


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


class DispatchCount:
    """Mutable counter handed out by :func:`count_dispatches`."""

    def __init__(self):
        self.count = 0

    def __int__(self) -> int:
        return self.count

    def __repr__(self) -> str:
        return f"DispatchCount({self.count})"


@contextlib.contextmanager
def count_dispatches():
    """Count compiled-program executions (XLA dispatches) in the block.

    Every execution of a compiled program — a jitted function call, an eager
    op, a ``jnp.asarray`` device put — counts as one.  On the remote
    accelerator tunnel each is one round trip (~31 ms), so the advertised
    O(1)-dispatch fused paths are worth pinning::

        with count_dispatches() as d:
            qr.factorize_values(v)
        assert d.count <= 1

    Nesting is safe (counters stack); the hook is removed on exit.  Counts
    host-side dispatch, so it works identically on the CPU test mesh and the
    real TPU.
    """
    import jax._src.pjit as _pjit
    from jax._src.interpreters import pxla

    counter = DispatchCount()
    orig_call = pxla.ExecuteReplicated.__call__
    orig_fp = _pjit._get_fastpath_data

    def counting(self, *args, **kwargs):
        counter.count += 1
        return orig_call(self, *args, **kwargs)

    # Warm jitted functions normally execute through jax's C++ fastpath,
    # which calls the XLA executable without touching any Python frame.
    # Returning None from _get_fastpath_data (and dropping already-installed
    # fastpath entries) routes every call through the Python executable
    # wrapper so it can be counted.  Dispatch gets slower inside the block;
    # nothing recompiles, and the fastpath re-installs itself afterwards.
    pxla.ExecuteReplicated.__call__ = counting
    _pjit._get_fastpath_data = lambda *a, **k: None
    for cache in (
        getattr(_pjit, "_cpp_pjit_cache_fun_only", None),
        getattr(_pjit, "_cpp_pjit_cache_explicit_attributes", None),
    ):
        try:
            cache.clear()
        except Exception:
            pass
    try:
        yield counter
    finally:
        pxla.ExecuteReplicated.__call__ = orig_call
        _pjit._get_fastpath_data = orig_fp


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

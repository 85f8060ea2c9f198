"""Tracing / profiling subsystem.

The reference has no profiling beyond wall-clock prints (SURVEY.md §5). Here
tracing is first-class: jax.profiler device traces (viewable in
TensorBoard/Perfetto), named-scope annotation that shows up in the trace
timeline, and a lightweight host-side timer registry for step-level
breakdowns in logs.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """Capture a device trace for everything in the block:

        with device_trace("runs/x/trace"):
            state, _ = train_step(...)
            jax.block_until_ready(state)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope visible in profiler timelines (use around sub-stages of a
    jitted function)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Host-side wall-clock accumulator with blocking semantics.

    timer = StepTimer()
    with timer.section("query"): out = f(); jax.block_until_ready(out)
    timer.report() -> {"query": {"mean_ms": ..., "count": ...}}
    """

    def __init__(self):
        self._acc: Dict[str, list] = defaultdict(list)

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        yield
        self._acc[name].append(time.perf_counter() - t0)

    def time_fn(self, name: str, fn, *args, **kw):
        with self.section(name):
            out = fn(*args, **kw)
            jax.block_until_ready(out)
        return out

    def report(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for k, v in self._acc.items():
            out[k] = {"mean_ms": 1000.0 * sum(v) / len(v),
                      "total_s": sum(v), "count": len(v)}
        return out

    def reset(self):
        self._acc.clear()

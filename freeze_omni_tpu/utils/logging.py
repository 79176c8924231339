"""Structured per-stage latency spans.

The reference's tracing is a print monkey-patch with millisecond timestamps and
a debug_time flag (bin/dialog_state_pred.py:52-59, 488-489, 747-755). Here
spans accumulate into a registry so the latency breakdown of assets/latency.png
(BASELINE.md) can be reported directly; `jax.profiler` hooks can wrap the same
spans on TPU.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List

_SPANS: Dict[str, List[float]] = defaultdict(list)


@contextlib.contextmanager
def span(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _SPANS[name].append(time.perf_counter() - t0)


def span_stats() -> Dict[str, dict]:
    out = {}
    for name, xs in _SPANS.items():
        s = sorted(xs)
        out[name] = {
            "count": len(s),
            "total_ms": sum(s) * 1e3,
            "avg_ms": sum(s) / len(s) * 1e3,
            "p50_ms": s[len(s) // 2] * 1e3,
            "p90_ms": s[min(len(s) - 1, int(len(s) * 0.9))] * 1e3,
        }
    return out


def span_report() -> str:
    lines = ["-- latency spans --"]
    for name, st in span_stats().items():
        lines.append(
            f"{name:>16}: n={st['count']:<4} avg={st['avg_ms']:8.1f}ms "
            f"p50={st['p50_ms']:8.1f}ms p90={st['p90_ms']:8.1f}ms"
        )
    return "\n".join(lines)


def reset_spans() -> None:
    _SPANS.clear()


@contextlib.contextmanager
def device_span(name: str):
    """Span that also annotates the XLA trace (visible in a jax.profiler
    capture, e.g. TensorBoard), so host spans line up with device timelines."""
    import jax.profiler

    with jax.profiler.TraceAnnotation(name):
        with span(name):
            yield


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a jax.profiler trace around a region:
    `with profile_trace('/tmp/tb'): engine.tick()` then inspect in
    TensorBoard. Replaces the reference's timestamped-print tracing."""
    import jax.profiler

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

"""Tracing / profiling utilities (SURVEY §5 aux subsystem).

The reference's observability is ad hoc: per-stage wall-clock prints inside
SynthesizerTrn.infer (wetts/vits/model/models.py:242-279), an RTF print
(inference.py:102), and a C++ Timer used by the HTTP server
(runtime/core/utils/timer.h, http_server.cc:87-94). The TPU equivalents
here: a monotonic Timer, a StageTimes accumulator for per-stage latency
reporting (p50/p99 across calls), and a `device_trace` context manager
wrapping jax.profiler for XLA/TPU timeline captures viewable in
TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict, deque
from typing import Deque, Dict, Iterator

# Per-stage history bound: a long-running server records stage times per
# request; an unbounded list would leak memory proportional to request
# count. 4096 observations keep p99 meaningful while capping memory.
MAX_OBSERVATIONS = 4096


class Timer:
    """Monotonic stopwatch (runtime/core/utils/timer.h equivalent)."""

    def __init__(self):
        self._start = time.perf_counter()

    def reset(self) -> None:
        self._start = time.perf_counter()

    def elapsed(self) -> float:
        """Seconds since construction/reset."""
        return time.perf_counter() - self._start

    def elapsed_ms(self) -> float:
        return self.elapsed() * 1e3


class StageTimes:
    """Named per-stage duration accumulator.

    Collects every observation so percentile latency (the streaming
    first-chunk p50/p99 metric in BASELINE.json config 5) can be reported,
    not just means.
    """

    def __init__(self, maxlen: int = MAX_OBSERVATIONS):
        self._times: Dict[str, Deque[float]] = defaultdict(
            lambda: deque(maxlen=maxlen))

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._times[name].append(time.perf_counter() - t0)

    def add(self, name: str, seconds: float) -> None:
        self._times[name].append(seconds)

    def reset(self) -> None:
        self._times.clear()

    def percentile(self, name: str, q: float) -> float:
        xs = sorted(self._times.get(name, ()))
        if not xs:
            return float("nan")
        idx = min(len(xs) - 1, int(round(q / 100.0 * (len(xs) - 1))))
        return xs[idx]

    def report(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self._times.items():
            out[name] = {
                "n": len(xs),
                "total_s": sum(xs),
                "mean_ms": 1e3 * sum(xs) / len(xs),
                "p50_ms": 1e3 * self.percentile(name, 50),
                "p99_ms": 1e3 * self.percentile(name, 99),
            }
        return out

    def summary(self) -> str:
        return "  ".join(
            f"{k}: {v['mean_ms']:.1f}ms(x{v['n']})"
            for k, v in sorted(self.report().items()))


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA/TPU profiler trace into `log_dir`.

    View with TensorBoard's profile plugin or Perfetto. No-op body errors
    propagate; the trace file is finalized either way.
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

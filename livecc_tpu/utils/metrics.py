"""First-class serving/training metrics + profiler hooks.

The reference has no tracing (SURVEY.md §5: tqdm only); here per-chunk
latency is a first-class metric — it IS the product's north star (p50
per-2-frame commentary latency < 2 s). ``LatencyTracker`` keeps streaming
histograms with percentile summaries; ``trace`` wraps a region with
jax.profiler so a TensorBoard-readable trace can be captured on demand
(set LIVECC_TRACE_DIR).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Iterator

import numpy as np


class LatencyTracker:
    """Streaming latency histograms keyed by event name."""

    def __init__(self, max_samples: int = 4096):
        self._samples: dict[str, list[float]] = defaultdict(list)
        self.max_samples = max_samples

    @contextlib.contextmanager
    def measure(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record(name, time.perf_counter() - t0)

    def record(self, name: str, seconds: float) -> None:
        buf = self._samples[name]
        buf.append(seconds)
        if len(buf) > self.max_samples:           # reservoir-ish: keep recent
            del buf[: len(buf) - self.max_samples]

    def reset(self) -> None:
        """Drop all samples (e.g. after a warmup phase, so summaries
        describe only the measured steady state)."""
        self._samples.clear()

    def summary(self, name: str | None = None) -> dict:
        names = [name] if name else sorted(self._samples)
        out = {}
        for n in names:
            xs = np.asarray(self._samples[n])
            if len(xs) == 0:
                continue
            out[n] = {
                "n": int(len(xs)),
                "p50": round(float(np.percentile(xs, 50)), 4),
                "p90": round(float(np.percentile(xs, 90)), 4),
                "p99": round(float(np.percentile(xs, 99)), 4),
                "mean": round(float(xs.mean()), 4),
                "max": round(float(xs.max()), 4),
            }
        return out if name is None else out.get(name, {})

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


@contextlib.contextmanager
def trace(label: str) -> Iterator[None]:
    """jax.profiler trace region; writes a device trace when
    LIVECC_TRACE_DIR is set (inspect with TensorBoard / xprof)."""
    trace_dir = os.environ.get("LIVECC_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(trace_dir, label)):
        yield

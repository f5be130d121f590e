"""Tracing / profiling hooks.

The reference's only latency instrumentation is a per-dialogue wall-clock
print (``generate.py:190,263-269``) and tqdm bars.  Here (SURVEY.md §5):

- :class:`PhaseTimer` — structured per-phase timers with p50/p90 summaries
  (phases: per-character denoise, perception, composition, final pass);
- :func:`trace` — a ``jax.profiler`` trace context writing a TensorBoard
  trace directory, for XLA-level op breakdowns;
- :func:`annotate` — ``jax.profiler.TraceAnnotation`` wrapper so host-side
  phases show up inside device traces.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Optional

import numpy as np


class PhaseTimer:
    """Accumulates wall-clock samples per named phase."""

    def __init__(self) -> None:
        self.samples: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append(time.perf_counter() - start)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self.samples.items():
            arr = np.asarray(xs)
            out[name] = {
                "count": int(arr.size),
                "total_s": float(arr.sum()),
                "mean_s": float(arr.mean()),
                "p50_s": float(np.percentile(arr, 50)),
                "p90_s": float(np.percentile(arr, 90)),
            }
        return out

    def report(self) -> str:
        return json.dumps(self.summary(), indent=2)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """``jax.profiler`` trace over the enclosed block (device + host)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Context manager: name host phases inside profiler traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)

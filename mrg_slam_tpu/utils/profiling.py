"""Tracing/profiling hooks — the jax.profiler analog of the reference's
chrono timers (mrg_slam_component.cpp:833-861, timing_stats.txt dump).

- `trace(logdir)`:   context manager around `jax.profiler.trace` producing
  TensorBoard-compatible device traces of the jitted SLAM kernels.
- `StageTimer`:      accumulates wall-clock per named stage and renders the
  same shape of summary the reference writes to timing_stats.txt.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    import jax

    with jax.profiler.trace(logdir):
        yield


class StageTimer:
    def __init__(self):
        self._acc: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._acc[name].append((time.perf_counter() - t0) * 1e6)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self._acc.items():
            out[name] = {"count": len(xs), "total_us": sum(xs),
                         "avg_us": sum(xs) / max(len(xs), 1),
                         "max_us": max(xs)}
        return out

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            for name, s in sorted(self.summary().items()):
                f.write(f"{name} count {s['count']} avg_us {s['avg_us']:.1f}"
                        f" max_us {s['max_us']:.1f}\n")

"""Tracing / profiling utilities (SURVEY.md §5: absent in the reference —
only commented-out CUDA memory prints at MFT/models.py:122-124; here a
first-class subsystem).

  * trace(dir):    jax.profiler context — produces a Perfetto/TensorBoard
                   trace of device execution.
  * StepTimer:     lightweight wall-clock per-step timing with summary stats
                   (p50/p95/mean), for train-loop telemetry without a tracer.
  * device_memory_stats(): live HBM usage per device where the backend
                   exposes it.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in Perfetto/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, name: str = "step"):
        self.name = name
        self.samples: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.samples.append(time.perf_counter() - self._t0)
        return False

    def summary(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        a = np.asarray(self.samples)
        return {"n": len(a), "mean_ms": float(a.mean() * 1e3),
                "p50_ms": float(np.percentile(a, 50) * 1e3),
                "p95_ms": float(np.percentile(a, 95) * 1e3),
                "total_s": float(a.sum())}


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        if s:
            out[str(d)] = {"bytes_in_use": s.get("bytes_in_use", -1),
                           "peak_bytes_in_use": s.get("peak_bytes_in_use",
                                                      -1)}
    return out

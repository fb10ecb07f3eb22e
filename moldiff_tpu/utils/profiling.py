"""Profiling / tracing hooks.

The reference has no tracing at all (SURVEY.md section 5); here training and
sampling can capture XLA traces via ``jax.profiler`` for TensorBoard /
Perfetto, plus a lightweight step timer with percentile summaries.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace into ``log_dir`` (view with
    TensorBoard's profile plugin or ui.perfetto.dev)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock stats for the training loop."""

    def __init__(self, window: int = 200):
        self.window = window
        self._times: List[float] = []
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now
        return dt

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        arr = np.asarray(self._times)
        return {
            "steps_per_sec": 1.0 / float(np.mean(arr)),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p95_ms": float(np.percentile(arr, 95) * 1e3),
            "max_ms": float(arr.max() * 1e3),
        }


def device_memory_stats() -> Dict[str, float]:
    """Per-device memory stats in MB (empty if backend doesn't report)."""
    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
        except Exception:
            continue
        if s:
            out[str(d.id)] = {
                "bytes_in_use_mb": s.get("bytes_in_use", 0) / 1e6,
                "peak_bytes_mb": s.get("peak_bytes_in_use", 0) / 1e6,
            }
    return out

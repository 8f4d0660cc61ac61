"""Tracing / profiling utilities.

The reference has no profiling at all (SURVEY.md §5 lists it as an absent
subsystem). The rebuild ships: jax.profiler traces (viewable in
TensorBoard/XProf/Perfetto), a per-step wall-clock tracker with warmup
separation, and a simple step-rate reporter used by bench.py and the CLI.
"""
from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace (HLO + device timeline) into logdir."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepTimer:
    """Wall-clock per-step statistics with warmup exclusion."""

    warmup: int = 2
    times: List[float] = field(default_factory=list)
    _t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @contextlib.contextmanager
    def step(self):
        self.start()
        yield
        self.stop()

    def summary(self) -> Dict[str, float]:
        steady = self.times[self.warmup :] or self.times
        if not steady:
            return {}
        return {
            "steps": len(self.times),
            "mean_s": sum(steady) / len(steady),
            "min_s": min(steady),
            "max_s": max(steady),
            "steps_per_sec": len(steady) / max(sum(steady), 1e-9),
        }

    def report(self) -> str:
        return json.dumps(self.summary())


def memory_stats() -> Dict[str, float]:
    """Per-device memory stats when the backend exposes them."""
    import jax

    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        if s:
            out[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use", 0),
                "peak_bytes_in_use": s.get("peak_bytes_in_use", 0),
            }
    return out

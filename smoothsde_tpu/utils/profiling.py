"""Profiling and timing hooks.

Replaces the reference's minimal instrumentation (TMB `silent` flag and
the system.time around optim, R/sde.R:491,692-700) with JAX-native
tracing: per-stage wall-clock (compile vs execute) and optional XLA
profiler traces viewable in TensorBoard/xprof.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class StageTimer:
    """Accumulates named wall-clock stages; first call per stage is
    recorded separately (it includes jit compilation)."""

    def __init__(self):
        self.first: Dict[str, float] = {}
        self.total: Dict[str, float] = {}
        self.count: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        if name not in self.first:
            self.first[name] = dt
        self.total[name] = self.total.get(name, 0.0) + dt
        self.count[name] = self.count.get(name, 0) + 1

    def summary(self) -> Dict[str, dict]:
        out = {}
        for name in self.total:
            n = self.count[name]
            steady = (
                (self.total[name] - self.first[name]) / (n - 1)
                if n > 1
                else self.first[name]
            )
            out[name] = {
                "calls": n,
                "first_s": self.first[name],  # includes compile
                "steady_s": steady,
                "total_s": self.total[name],
            }
        return out


@contextlib.contextmanager
def xla_trace(log_dir: Optional[str]):
    """Capture an XLA profiler trace into log_dir (None = no-op)."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

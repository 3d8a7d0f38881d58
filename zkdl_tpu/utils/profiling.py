"""Profiling / tracing utilities (SURVEY.md §5.1 rebuild item).

The reference's only instrumentation is a wall-clock Timer around the proving
loop (/root/reference/timer.hpp:6-22, demo.cu:124-140). Here:

- ``PhaseTimer``: accumulating named phase timers with true device fencing
  (host readback of a tiny slice — block_until_ready alone is unreliable over
  remote-device tunnels) and derived rates (Fr-muls/s etc.).
- ``trace``: context manager around ``jax.profiler`` producing a TensorBoard
  trace directory when profiling is available on the backend.
- ``phase``: decorator/context manager to time a code block into a PhaseTimer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any

import numpy as np


def fence(*outs: Any) -> None:
    """True completion barrier for device values (in-order queues => fencing
    the last dispatch fences everything before it)."""
    import jax

    for out in outs:
        for leaf in jax.tree_util.tree_leaves(out):
            if hasattr(leaf, "ravel"):
                np.asarray(leaf.ravel()[:1])


class PhaseTimer:
    """Accumulating wall-clock timers keyed by phase name (Timer, timer.cpp:3-27,
    generalized to many phases + op-rate reporting)."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}
        self.ops: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, ops: float = 0.0, fence_out: Any = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if fence_out is not None:
                fence(fence_out)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1
            if ops:
                self.ops[name] = self.ops.get(name, 0.0) + ops

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            t = self.totals[name]
            line = f"{name:28s} {t*1e3:10.1f} ms  x{self.counts[name]}"
            if name in self.ops and t > 0:
                line += f"  {self.ops[name]/t/1e6:9.1f} M ops/s"
            lines.append(line)
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace (view with TensorBoard); no-op if unsupported."""
    import jax

    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass

"""Profiling: wall-clock timers + jax.profiler traces.

The reference's profiling is an ad-hoc `measure_time` template
(`apps/hastar_planner.cpp:29-48`) and hot-spot percentages in comments
(`slam/hastar.cpp:26-28,83-86`). The TPU equivalents here:

  * `device_timer` — wall-clock timing that actually synchronizes: on
    tunneled backends `block_until_ready` can return before execution
    completes, so the timer fences by fetching a scalar through the
    dependency chain.
  * `trace` — `jax.profiler.trace` context writing a perfetto/tensorboard
    trace directory for per-kernel analysis.
  * `Stopwatch` — accumulating per-phase timer for step loops.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax
import numpy as np


def fence(tree) -> None:
    """Synchronize on a pytree result (host fetch of one element per leading
    leaf; robust where block_until_ready is unreliable)."""
    leaves = [l for l in jax.tree.leaves(tree) if hasattr(l, "dtype")]
    if leaves:
        leaf = leaves[0]
        np.asarray(jax.device_get(leaf.ravel()[:1] if leaf.ndim else leaf))


@contextmanager
def device_timer(label: str, result_box: dict | None = None):
    """Time a block, fencing on `result_box['out']` if the caller stores its
    result there."""
    t0 = time.perf_counter()
    box = result_box if result_box is not None else {}
    yield box
    if "out" in box:
        fence(box["out"])
    dt = time.perf_counter() - t0
    print(f"{label}: {dt * 1e3:.1f} ms")
    box["seconds"] = dt


@contextmanager
def trace(logdir: str):
    """jax.profiler trace context (open with perfetto/tensorboard)."""
    with jax.profiler.trace(logdir):
        yield


class Stopwatch:
    """Accumulating phase timer for step loops."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextmanager
    def phase(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            fence(result)
        self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name}: {total * 1e3:.1f} ms total, {total / n * 1e3:.2f} ms/call x{n}")
        return "\n".join(lines)

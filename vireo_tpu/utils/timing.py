"""Lightweight observability: phase timers and throughput counters.

The reference's only instrumentation is wall-clock prints
(vireo.py:25,244-246). This adds structured per-phase timing plus
EM-throughput counters (iters/s, cells/s), and an optional JAX
profiler trace hook for deep dives.
"""

import time
import contextlib
import json

__all__ = ["PhaseTimer", "throughput", "profile_trace"]


class PhaseTimer:
    """Accumulates named phase durations; printable as one summary."""

    def __init__(self):
        self.phases = {}
        self._order = []

    @contextlib.contextmanager
    def phase(self, name):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            if name not in self.phases:
                self._order.append(name)
                self.phases[name] = 0.0
            self.phases[name] += dt

    def summary(self):
        total = sum(self.phases.values())
        lines = ["[vireo] timing: total %.2fs" % total]
        for name in self._order:
            dt = self.phases[name]
            lines.append("  %-24s %8.2fs  %5.1f%%"
                         % (name, dt, 100 * dt / max(total, 1e-9)))
        return "\n".join(lines)

    def json(self):
        return json.dumps(self.phases)


def throughput(n_iters, n_cells, seconds):
    """EM throughput counters as a dict (iters/s, cell-iters/s)."""
    return {
        "em_iters_per_s": n_iters / seconds if seconds > 0 else float("inf"),
        "cell_iters_per_s": n_iters * n_cells / seconds
        if seconds > 0 else float("inf"),
        "seconds": seconds,
    }


@contextlib.contextmanager
def profile_trace(log_dir=None):
    """JAX profiler trace around a block when `log_dir` is set (view
    with TensorBoard / xprof); no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

"""Named cumulative wall-clock timers + hierarchical report.

Mirrors timers.c:29-227 (Timer_Start/Stop/Value/Reduce) and the solver
timing report (print_timing_stat, psolve.c:6041-6274).  Device work is
fenced with jax.block_until_ready so phases are attributed honestly
(the reference's enable_timing_barriers equivalent)."""

from __future__ import annotations

import time
from contextlib import contextmanager


class Timers:
    def __init__(self, fence=False):
        self.acc = {}
        self.running = {}
        self.counts = {}
        self.fence = fence

    def start(self, name):
        self.running[name] = time.perf_counter()

    def stop(self, name, fence_value=None):
        if self.fence and fence_value is not None:
            import jax
            jax.block_until_ready(fence_value)
        t0 = self.running.pop(name, None)
        if t0 is None:
            return
        self.acc[name] = self.acc.get(name, 0.0) + time.perf_counter() - t0
        self.counts[name] = self.counts.get(name, 0) + 1

    @contextmanager
    def measure(self, name, fence_value=None):
        self.start(name)
        try:
            yield
        finally:
            self.stop(name, fence_value)

    def value(self, name):
        return self.acc.get(name, 0.0)

    def report(self, out=None, total=None):
        import sys
        out = out or sys.stdout
        out.write("\n# %-40s %12s %8s\n" % ("timer", "seconds", "calls"))
        out.write("# " + "-" * 64 + "\n")
        items = sorted(self.acc.items(), key=lambda kv: -kv[1])
        tot = total or sum(self.acc.values())
        for name, v in items:
            pct = 100.0 * v / tot if tot else 0.0
            out.write("  %-40s %12.3f %8d  %5.1f%%\n"
                      % (name, v, self.counts.get(name, 0), pct))
        out.write("  %-40s %12.3f\n" % ("TOTAL", tot))


GLOBAL_TIMERS = Timers()

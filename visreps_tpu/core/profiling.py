"""Tracing / profiling utilities (aux subsystem, SURVEY.md §5.1).

The reference has no formal profiling (rich progress bars only). The
TPU build provides:
  * ``trace(dir)`` — context manager around jax.profiler traces
    (view with TensorBoard / xprof);
  * ``PhaseTimer`` — per-phase wall-clock + item-throughput counters
    printed as a summary table;
  * ``log_compile_time`` — wraps a jitted fn to report its first-call
    (compile) vs steady-state latency, useful on remote-compile TPU
    terminals where cold compiles dominate.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

from visreps_tpu.core.logging import rprint


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        rprint(f"Profiler trace written to {log_dir}", style="info")


@dataclass
class PhaseTimer:
    """Accumulates (wall seconds, items) per named phase."""

    phases: dict = field(default_factory=dict)
    _open: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str, items: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            secs, count = self.phases.get(name, (0.0, 0))
            self.phases[name] = (secs + dt, count + items)

    def summary(self) -> str:
        lines = [f"{'phase':<28}{'seconds':>10}{'items':>10}{'items/s':>12}"]
        total = 0.0
        for name, (secs, items) in self.phases.items():
            rate = f"{items / secs:>12.1f}" if items and secs > 0 else f"{'—':>12}"
            lines.append(f"{name:<28}{secs:>10.2f}{items:>10}{rate}")
            total += secs
        lines.append(f"{'TOTAL':<28}{total:>10.2f}")
        return "\n".join(lines)

    def report(self):
        rprint(self.summary(), style="info")


def log_compile_time(fn, *args, label: str = "fn", **kwargs):
    """Run fn twice; report (compile+run, steady run). Returns output."""
    import jax

    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    warm = time.perf_counter() - t0
    rprint(f"{label}: compile+run {cold:.2f}s, steady {warm * 1000:.1f}ms", style="info")
    return out

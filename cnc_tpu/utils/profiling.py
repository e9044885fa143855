"""Tracing and section timing.

The reference has no wired-in profiling (SURVEY.md §5: pyinstrument pinned
but unused; manual time.time() only).  Here: jax.profiler trace capture plus
lightweight section timers that force device completion (a host pull —
`block_until_ready` is not reliable through remote-relay backends).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def force(x):
    """Force device execution to complete (works through the axon relay)."""
    leaves = [l for l in jax.tree.leaves(x)
              if isinstance(l, jax.Array)]
    if leaves:
        float(jnp.sum(leaves[0].ravel()[0]))
    return x


class SectionTimers:
    """Accumulating named wall-clock sections.

    with timers.section("render", sync=out):
        out = step(...)
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        yield
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def timed(self, name: str, fn, *args, **kw):
        t0 = time.perf_counter()
        out = force(fn(*args, **kw))
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1
        return out

    def summary(self) -> str:
        rows = []
        for k in sorted(self.totals, key=lambda k: -self.totals[k]):
            n = self.counts[k]
            rows.append(f"{k}: {self.totals[k]:.3f}s total, "
                        f"{self.totals[k] / max(n, 1) * 1e3:.1f} ms/call x{n}")
        return "\n".join(rows)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/cnc_tpu_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()

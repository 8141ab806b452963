"""Profiling and phase timing.

The reference has no profiler hooks (SURVEY §5: nothing beyond tqdm).
Here profiling is first-class:

* ``trace`` — context manager around ``jax.profiler.trace`` writing a
  TensorBoard-viewable device trace.
* ``annotate`` — ``jax.profiler.TraceAnnotation`` wrapper for labeling host
  spans inside a trace.
* ``PhaseTimer`` — wall-clock per-phase accumulation that reports into the
  HierarchicalLogger as ``time/{phase}_s`` metrics (per-phase step timing as
  first-class metrics).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Device+host profiler trace (view in TensorBoard's profile tab)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a host-side span inside an active trace."""
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Accumulates wall-clock per phase; flushes into a logger.

    Note: JAX dispatch is async — wrap ``block=True`` phases around the spans
    you want to attribute device time to, otherwise spans measure dispatch.
    """

    def __init__(self, logger=None):
        self.logger = logger
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                # Fetch (not block_until_ready): on some remote/tunneled TPU
                # platforms block_until_ready can return before remote
                # execution completes; a device->host value fetch cannot.
                for leaf in jax.tree.leaves(block_on):
                    if hasattr(leaf, "sum"):
                        float(leaf.sum())
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self, reset: bool = True) -> Dict[str, float]:
        out = {}
        for name, total in self.totals.items():
            out[f"time/{name}_s"] = total
            out[f"time/{name}_mean_s"] = total / max(1, self.counts[name])
        if self.logger is not None:
            for k, v in out.items():
                self.logger.record(k, v)
        if reset:
            self.totals.clear()
            self.counts.clear()
        return out

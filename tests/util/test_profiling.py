"""Profiling utilities: trace context, annotations, PhaseTimer.

The reference has no profiler (SURVEY §5: tqdm only); these are our build's
first-class additions, so the tests define the contract.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from imitation_tpu.util import profiling


def test_phase_timer_accumulates_and_reports():
    t = profiling.PhaseTimer()
    with t.phase("a"):
        x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
    with t.phase("a", block_on=x):
        pass
    with t.phase("b"):
        pass
    rep = t.report()
    assert set(rep) >= {"time/a_s", "time/b_s"}
    assert rep["time/a_s"] >= 0
    # reset=True clears accumulators
    assert t.report() == {}


def test_phase_timer_logs_to_logger():
    class Rec:
        def __init__(self):
            self.vals = {}

        def record(self, k, v):
            self.vals[k] = v

    logger = Rec()
    t = profiling.PhaseTimer(logger=logger)
    with t.phase("x"):
        pass
    t.report()
    assert any(k.startswith("time/") for k in logger.vals)


def test_annotate_runs_inside_jit():
    @jax.jit
    def f(x):
        with profiling.annotate("matmul"):
            return x @ x

    out = f(jnp.ones((8, 8)))
    np.testing.assert_allclose(np.asarray(out), 8.0)


def test_trace_writes_profile(tmp_path):
    d = str(tmp_path / "trace")
    with profiling.trace(d):
        (jnp.ones((32, 32)) @ jnp.ones((32, 32))).block_until_ready()
    # jax writes plugins/profile/<ts>/*; just require non-empty output tree
    entries = [os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs]
    assert entries

"""Property-based trajectory/serialization tests.

Counterpart of the reference's hypothesis strategies
(src/imitation/testing/hypothesis_strategies.py:11-141 used by
tests/data/test_types.py): random trajectories over sampled space shapes
must round-trip through serialization and batch conversion.
"""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from imitation_tpu.data import serialize, types

traj_lengths = st.integers(min_value=1, max_value=8)
obs_dims = st.integers(min_value=1, max_value=4)
act_dims = st.integers(min_value=1, max_value=3)
discrete = st.booleans()
terminal = st.booleans()
seeds = st.integers(min_value=0, max_value=2**31 - 1)


def build_traj(length, obs_dim, act_dim, is_discrete, term, seed):
    rng = np.random.default_rng(seed)
    obs = rng.normal(size=(length + 1, obs_dim)).astype(np.float32)
    if is_discrete:
        acts = rng.integers(0, 5, size=(length,)).astype(np.int64)
    else:
        acts = rng.normal(size=(length, act_dim)).astype(np.float32)
    rews = rng.normal(size=(length,)).astype(np.float64)
    return types.TrajectoryWithRew(
        obs=obs, acts=acts, rews=rews, infos=None, terminal=term
    )


@given(traj_lengths, obs_dims, act_dims, discrete, terminal, seeds)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_trajectory_invariants(length, obs_dim, act_dim, is_discrete, term, seed):
    t = build_traj(length, obs_dim, act_dim, is_discrete, term, seed)
    assert len(t) == length
    assert t.obs.shape[0] == length + 1
    # slicing keeps invariants
    if length >= 2:
        s = t[0:length - 1]
        assert len(s) == length - 1
        assert s.obs.shape[0] == length
        assert not s.terminal


@given(st.lists(st.tuples(traj_lengths, terminal, seeds), min_size=1, max_size=4),
       obs_dims, act_dims, discrete)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_serialization_roundtrip(specs, obs_dim, act_dim, is_discrete):
    import tempfile

    trajs = [build_traj(n, obs_dim, act_dim, is_discrete, term, seed)
             for n, term, seed in specs]
    with tempfile.TemporaryDirectory() as td:
        path = str(td) + "/rollouts"
        serialize.save(path, trajs)
        loaded = serialize.load(path)
    assert len(loaded) == len(trajs)
    for a, b in zip(trajs, loaded):
        np.testing.assert_allclose(a.obs, b.obs, rtol=1e-6)
        np.testing.assert_array_equal(a.acts, b.acts)
        np.testing.assert_allclose(a.rews, b.rews, rtol=1e-6)
        assert a.terminal == b.terminal


@given(st.lists(st.tuples(traj_lengths, terminal, seeds), min_size=1, max_size=4),
       obs_dims, act_dims)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_trajectory_batch_roundtrip(specs, obs_dim, act_dim):
    trajs = [build_traj(n, obs_dim, act_dim, False, term, seed)
             for n, term, seed in specs]
    batch = types.TrajectoryBatch.from_host(trajs)
    assert batch.batch_size == len(trajs)
    lengths = np.asarray(batch.lengths)
    np.testing.assert_array_equal(lengths, [len(t) for t in trajs])
    # masked reward sums match per-trajectory sums
    rews = np.asarray(batch.rews)
    for i, t in enumerate(trajs):
        # batch rews are float32 on device; near-zero sums need an atol
        np.testing.assert_allclose(
            rews[i, : len(t)].sum(), t.rews.sum(), rtol=1e-4, atol=1e-5
        )
        # padding contributes zero
        np.testing.assert_allclose(rews[i, len(t):].sum(), 0.0, atol=1e-6)
    # flatten yields total valid steps
    flat = batch.flatten()
    assert flat.batch_size == sum(len(t) for t in trajs)

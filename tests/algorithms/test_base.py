"""Tests for algorithms.base: fixed-horizon check, demonstration-format
normalization, DemonstrationStore minibatching, pickling.

Reference: tests/algorithms/test_base.py (test_check_fixed_horizon,
test_check_fixed_horizon_flag, test_make_data_loader,
test_make_data_loader_batch_size).
"""

import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imitation_tpu.algorithms import base
from imitation_tpu.data import types


def traj(n, terminal=True, obs_dim=3):
    return types.TrajectoryWithRew(
        obs=np.zeros((n + 1, obs_dim), np.float32),
        acts=np.zeros((n,), np.int64),
        infos=None,
        terminal=terminal,
        rews=np.ones((n,), np.float64),
    )


class _Algo(base.BaseImitationAlgorithm):
    pass


class TestCheckFixedHorizon:
    def test_same_length_ok(self):
        algo = _Algo()
        algo._check_fixed_horizon([5, 5, 5])
        algo._check_fixed_horizon([5])

    def test_variable_raises(self):
        algo = _Algo()
        with pytest.raises(ValueError, match="different length"):
            algo._check_fixed_horizon([5, 6])

    def test_remembers_across_calls(self):
        """A later batch with a different (self-consistent) horizon still
        trips the check (reference base.py:77-110 records self._horizon)."""
        algo = _Algo()
        algo._check_fixed_horizon([7, 7])
        with pytest.raises(ValueError, match="different length"):
            algo._check_fixed_horizon([8, 8])

    def test_flag_disables_check(self):
        algo = _Algo(allow_variable_horizon=True)
        algo._check_fixed_horizon([5, 6, 7])  # no raise

    def test_empty_ok(self):
        algo = _Algo()
        algo._check_fixed_horizon([])


class TestDemonstrationFormats:
    def test_from_trajectories(self):
        batch = base.demonstrations_to_batch([traj(4), traj(4)])
        assert batch.batch_size == 8
        assert batch.obs.shape == (8, 3)

    def test_from_transitions(self):
        t = types.Transitions(
            obs=np.zeros((6, 3), np.float32),
            acts=np.zeros((6,), np.int64),
            infos=None,
            next_obs=np.zeros((6, 3), np.float32),
            dones=np.zeros((6,), bool),
        )
        batch = base.demonstrations_to_batch(t)
        assert batch.batch_size == 6

    def test_from_batch_dicts(self):
        dicts = [
            {"obs": np.zeros((2, 3), np.float32), "acts": np.zeros((2,), np.int64)},
            {"obs": np.ones((3, 3), np.float32), "acts": np.ones((3,), np.int64)},
        ]
        batch = base.demonstrations_to_batch(dicts)
        assert batch.batch_size == 5

    def test_passthrough_device_batch(self):
        b = types.TransitionBatch(
            obs=jnp.zeros((4, 3)), acts=jnp.zeros((4,), jnp.int32),
            next_obs=jnp.zeros((4, 3)), dones=jnp.zeros((4,)),
            rews=jnp.zeros((4,)),
        )
        assert base.demonstrations_to_batch(b) is b

    def test_empty_raises(self):
        with pytest.raises(ValueError, match="[Ee]mpty"):
            base.demonstrations_to_batch([])

    def test_unsupported_type_raises(self):
        with pytest.raises(TypeError, match="unsupported"):
            base.demonstrations_to_batch(42)


class TestDemonstrationStore:
    def make(self, n=10):
        return base.DemonstrationStore.from_demonstrations([traj(n)])

    def test_epoch_indices_cover_dataset(self):
        store = self.make(12)
        idx = store.epoch_indices(jax.random.key(0), batch_size=4)
        assert idx.shape == (3, 4)
        assert set(np.asarray(idx).ravel().tolist()) == set(range(12))

    def test_epoch_indices_drop_last(self):
        store = self.make(10)
        idx = store.epoch_indices(jax.random.key(0), batch_size=4)
        assert idx.shape == (2, 4)  # 10 // 4, remainder dropped

    def test_epoch_indices_wraparound_when_keep_last(self):
        store = self.make(10)
        idx = store.epoch_indices(jax.random.key(0), batch_size=4, drop_last=False)
        assert idx.shape == (3, 4)
        # all 10 samples appear at least once
        assert set(np.asarray(idx).ravel().tolist()) == set(range(10))

    def test_batch_size_too_large_raises(self):
        store = self.make(5)
        with pytest.raises(ValueError, match="batch_size"):
            store.epoch_indices(jax.random.key(0), batch_size=8)

    def test_sample_with_replacement(self):
        store = self.make(6)
        b = store.sample(jax.random.key(1), 32)
        assert b.batch_size == 32


def test_pickle_drops_and_restores_logger():
    """Reference base.py:112-121: loggers are not pickled; a fresh default
    logger is installed on unpickle."""
    algo = _Algo()
    blob = pickle.dumps(algo)
    restored = pickle.loads(blob)
    assert restored.logger is not None
    restored.logger.record("x", 1.0)  # usable

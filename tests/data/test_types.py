"""Tests for trajectory/transition types — validation, slicing, device batches.

Modeled on the reference's tests/data/test_types.py (521 LoC): invariant
violations raise, slicing semantics, DictObs behavior, plus the device-tier
padded-batch round trips that have no reference counterpart.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imitation_tpu.data import types


def make_traj(n=5, obs_dim=3, act_dim=2, rew=True, terminal=True):
    obs = np.arange((n + 1) * obs_dim, dtype=np.float32).reshape(n + 1, obs_dim)
    acts = np.ones((n, act_dim), np.float32)
    if rew:
        return types.TrajectoryWithRew(
            obs=obs, acts=acts, infos=None, terminal=terminal,
            rews=np.arange(n, dtype=np.float64),
        )
    return types.Trajectory(obs=obs, acts=acts, infos=None, terminal=terminal)


class TestTrajectory:
    def test_invariants(self):
        t = make_traj()
        assert len(t) == 5

    def test_obs_act_mismatch_raises(self):
        with pytest.raises(ValueError, match="one more observation"):
            types.Trajectory(
                obs=np.zeros((5, 3)), acts=np.zeros((5, 2)), infos=None, terminal=True
            )

    def test_infos_length_raises(self):
        with pytest.raises(ValueError, match="infos"):
            types.Trajectory(
                obs=np.zeros((6, 3)),
                acts=np.zeros((5, 2)),
                infos=np.array([{}] * 3),
                terminal=True,
            )

    def test_rews_shape_raises(self):
        with pytest.raises(ValueError, match="rewards must be 1D"):
            types.TrajectoryWithRew(
                obs=np.zeros((6, 3)), acts=np.zeros((5, 2)), infos=None,
                terminal=True, rews=np.zeros((4,)),
            )

    def test_rews_dtype_raises(self):
        with pytest.raises(ValueError, match="dtype"):
            types.TrajectoryWithRew(
                obs=np.zeros((6, 3)), acts=np.zeros((5, 2)), infos=None,
                terminal=True, rews=np.zeros((5,), dtype=np.int32),
            )

    def test_slice(self):
        t = make_traj(n=6)
        s = t[1:4]
        assert len(s) == 3
        assert s.obs.shape == (4, 3)
        assert not s.terminal  # interior slice can't be terminal
        np.testing.assert_array_equal(s.rews, t.rews[1:4])

    def test_eq(self):
        assert make_traj() == make_traj()
        other = make_traj(n=4)
        assert make_traj() != other


class TestTransitions:
    def test_basic(self):
        tr = types.Transitions(
            obs=np.zeros((4, 3)), acts=np.zeros((4, 2)), infos=np.array([{}] * 4),
            next_obs=np.ones((4, 3)), dones=np.zeros(4, bool),
        )
        assert len(tr) == 4
        sliced = tr[1:3]
        assert len(sliced) == 2
        item = tr[0]
        assert isinstance(item, dict)

    def test_mismatched_lengths_raise(self):
        with pytest.raises(ValueError, match="same number of timesteps"):
            types.TransitionsMinimal(
                obs=np.zeros((4, 3)), acts=np.zeros((5, 2)), infos=np.array([{}] * 5)
            )

    def test_dones_dtype_raises(self):
        with pytest.raises(ValueError, match="boolean"):
            types.Transitions(
                obs=np.zeros((4, 3)), acts=np.zeros((4, 2)), infos=np.array([{}] * 4),
                next_obs=np.zeros((4, 3)), dones=np.zeros(4, np.int32),
            )

    def test_obs_next_obs_shape_mismatch_raises(self):
        with pytest.raises(ValueError):
            types.Transitions(
                obs=np.zeros((4, 3)), acts=np.zeros((4, 2)), infos=np.array([{}] * 4),
                next_obs=np.zeros((4, 5)), dones=np.zeros(4, bool),
            )


class TestDictObs:
    def test_len_and_indexing(self):
        d = types.DictObs({"a": np.zeros((5, 2)), "b": np.ones((5, 3))})
        assert len(d) == 5
        assert d[1:3].shape["a"] == (2, 2)
        single = d[0]
        assert single.shape["a"] == (2,)

    def test_conflicting_lengths_raise(self):
        d = types.DictObs({"a": np.zeros((5, 2)), "b": np.ones((4, 3))})
        with pytest.raises(RuntimeError, match="conflicting"):
            len(d)

    def test_stack_concat(self):
        d1 = types.DictObs({"a": np.zeros((2,))})
        d2 = types.DictObs({"a": np.ones((2,))})
        st = types.DictObs.stack([d1, d2])
        assert st.shape["a"] == (2, 2)
        cat = types.DictObs.concatenate([d1, d2])
        assert cat.shape["a"] == (4,)

    def test_eq(self):
        assert types.DictObs({"a": np.ones(3)}) == types.DictObs({"a": np.ones(3)})
        assert types.DictObs({"a": np.ones(3)}) != types.DictObs({"a": np.zeros(3)})

    def test_trajectory_with_dictobs(self):
        obs = types.DictObs({"x": np.zeros((6, 2))})
        t = types.Trajectory(obs=obs, acts=np.zeros((5, 1)), infos=None, terminal=True)
        assert len(t) == 5


class TestDeviceTier:
    def test_trajectory_batch_roundtrip(self):
        trajs = [make_traj(n=n) for n in [3, 5, 4]]
        batch = types.TrajectoryBatch.from_host(trajs)
        assert batch.batch_size == 3
        assert batch.max_length == 5
        np.testing.assert_array_equal(np.asarray(batch.lengths), [3, 5, 4])
        mask = np.asarray(batch.mask)
        assert mask.sum() == 12
        # padded rews are zero
        rews = np.asarray(batch.rews)
        assert rews[0, 3:].sum() == 0

    def test_trajectory_batch_flatten(self):
        trajs = [make_traj(n=3), make_traj(n=2, terminal=False)]
        batch = types.TrajectoryBatch.from_host(trajs)
        flat = batch.flatten()
        assert flat.batch_size == 5
        dones = np.asarray(flat.dones)
        # only first traj is terminal; done at its last step
        assert dones.sum() == 1

    def test_transition_batch_from_host(self):
        tr = types.TransitionsWithRew(
            obs=np.zeros((4, 3), np.float32),
            acts=np.zeros((4, 2), np.float32),
            infos=np.array([{}] * 4),
            next_obs=np.ones((4, 3), np.float32),
            dones=np.array([False, True, False, True]),
            rews=np.arange(4, dtype=np.float32),
        )
        b = types.TransitionBatch.from_host(tr)
        assert b.batch_size == 4
        np.testing.assert_array_equal(np.asarray(b.dones), [0.0, 1.0, 0.0, 1.0])
        # pytree: can map over it
        doubled = jax.tree.map(lambda x: x * 2, b)
        np.testing.assert_array_equal(np.asarray(doubled.rews), [0, 2, 4, 6])

    def test_transition_batch_take(self):
        tr = types.TransitionsWithRew(
            obs=np.arange(12, dtype=np.float32).reshape(4, 3),
            acts=np.zeros((4, 1), np.float32),
            infos=np.array([{}] * 4),
            next_obs=np.ones((4, 3), np.float32),
            dones=np.zeros(4, bool),
            rews=np.arange(4, dtype=np.float32),
        )
        b = types.TransitionBatch.from_host(tr)
        sel = b.take(jnp.asarray([2, 0]))
        np.testing.assert_array_equal(np.asarray(sel.rews), [2.0, 0.0])


def test_collate_fn():
    batch = [
        {"obs": np.zeros(3), "acts": np.ones(2), "infos": {}},
        {"obs": np.ones(3), "acts": np.zeros(2), "infos": {"a": 1}},
    ]
    out = types.transitions_collate_fn(batch)
    assert out["obs"].shape == (2, 3)
    assert isinstance(out["infos"], list)

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


def make_transitions(n=6, obs_dim=3, cls=None, **over):
    cls = cls or types.TransitionsWithRew
    obs = np.arange(n * obs_dim, dtype=np.float32).reshape(n, obs_dim)
    kw = dict(
        obs=obs,
        acts=np.ones((n, 2), np.float32),
        infos=np.array([{}] * n),
    )
    if cls is not types.TransitionsMinimal:
        kw.update(
            next_obs=obs + 1.0,
            dones=np.zeros(n, dtype=bool),
        )
    if cls is types.TransitionsWithRew:
        kw["rews"] = np.arange(n, dtype=np.float32)
    kw.update(over)
    return cls(**kw)


class TestInvalidInputs:
    """Error-path parity with reference tests/data/test_types.py:276-407."""

    def test_zero_length_trajectory_fails(self):
        # reference test_zero_length_fails (:409-414)
        with pytest.raises(ValueError, match="Degenerate trajectory"):
            types.Trajectory(
                obs=np.ones((1, 2), np.float32),
                acts=np.zeros((0, 1), np.float32),
                infos=None,
                terminal=True,
            )

    def test_missing_obs_raises(self):
        t = make_traj()
        with pytest.raises(ValueError, match="one more observation than actions"):
            dataclasses.replace(t, obs=t.obs[:-1])
        with pytest.raises(ValueError, match="one more observation than actions"):
            dataclasses.replace(t, acts=t.acts[:-1])

    def test_infos_shorter_raises(self):
        t = make_traj()
        with pytest.raises(ValueError, match="infos when present"):
            dataclasses.replace(t, infos=np.array([{}] * (len(t) - 1)))

    def test_rews_2d_raises(self):
        t = make_traj()
        with pytest.raises(ValueError, match="rewards must be 1D"):
            dataclasses.replace(t, rews=np.zeros((len(t), 2)))

    def test_rews_int_dtype_raises(self):
        t = make_traj()
        with pytest.raises(ValueError, match="not a float"):
            dataclasses.replace(t, rews=np.zeros(len(t), dtype=int))

    @pytest.mark.parametrize(
        "cls",
        [types.TransitionsMinimal, types.Transitions, types.TransitionsWithRew],
    )
    def test_transitions_acts_mismatch_raises(self, cls):
        tr = make_transitions(cls=cls)
        with pytest.raises(ValueError, match="same number of timesteps"):
            dataclasses.replace(tr, acts=tr.acts[:-1])

    def test_transitions_infos_mismatch_raises(self):
        tr = make_transitions()
        with pytest.raises(ValueError, match="obs and infos"):
            dataclasses.replace(tr, infos=np.array([{}] * (len(tr) - 1)))

    def test_next_obs_shape_mismatch_raises(self):
        tr = make_transitions()
        with pytest.raises(ValueError, match="same shape"):
            dataclasses.replace(tr, next_obs=np.zeros((len(tr), 4, 2), np.float32))

    def test_next_obs_dtype_mismatch_raises(self):
        # reference test_invalid_transitions dtype branch (:378-385)
        tr = make_transitions()
        with pytest.raises(ValueError, match="same dtype"):
            dataclasses.replace(
                tr, next_obs=np.zeros_like(np.asarray(tr.next_obs), dtype=bool)
            )

    def test_dones_2d_raises(self):
        tr = make_transitions()
        with pytest.raises(ValueError, match="dones must be 1D"):
            dataclasses.replace(
                tr, dones=np.zeros((len(tr), 2), dtype=bool)
            )

    def test_dones_int_dtype_raises(self):
        tr = make_transitions()
        with pytest.raises(ValueError, match="dones must be boolean"):
            dataclasses.replace(tr, dones=np.zeros(len(tr), dtype=int))


class TestEqualityPerturbations:
    """reference test_traj_unequal_to_perturbations (:184-218)."""

    def test_unequal_to_other_types(self):
        t = make_traj()
        assert t != 42
        assert t != "x"
        assert t != None  # noqa: E711

    def test_equal_to_copy(self):
        a, b = make_traj(), make_traj()
        assert a == b

    def test_unequal_on_each_field(self):
        base = make_traj()
        assert base != dataclasses.replace(base, terminal=False)
        assert base != dataclasses.replace(base, rews=base.rews + 1)
        assert base != dataclasses.replace(
            base, acts=np.asarray(base.acts) + 1
        )
        obs2 = np.asarray(base.obs).copy()
        obs2[0, 0] += 1
        assert base != dataclasses.replace(base, obs=obs2)

    def test_traj_without_rew_not_equal_with_rew(self):
        a = make_traj(rew=False)
        b = make_traj(rew=True)
        assert a != b


class TestTransitionsSlicing:
    """reference test_valid_transitions slicing sweep (:319-347)."""

    @pytest.mark.parametrize(
        "cls",
        [types.TransitionsMinimal, types.Transitions, types.TransitionsWithRew],
    )
    def test_random_slices_preserve_type_and_content(self, cls):
        tr = make_transitions(n=8, cls=cls)
        rng = np.random.default_rng(0)
        for _ in range(20):
            start = int(rng.integers(-2, 8))
            stop = int(rng.integers(0, 10))
            s = slice(start, stop)
            sub = tr[s]
            assert type(sub) is cls
            np.testing.assert_array_equal(
                np.asarray(sub.obs), np.asarray(tr.obs)[s]
            )
            np.testing.assert_array_equal(sub.acts, tr.acts[s])

    def test_int_index_returns_dict(self):
        tr = make_transitions(n=4)
        item = tr[2]
        assert isinstance(item, dict)
        np.testing.assert_array_equal(item["obs"], np.asarray(tr.obs)[2])
        np.testing.assert_array_equal(item["rews"], tr.rews[2])

    def test_array_index_gathers(self):
        tr = make_transitions(n=6)
        sub = tr[np.array([0, 3, 5])]
        assert type(sub) is types.TransitionsWithRew
        assert len(sub) == 3
        np.testing.assert_array_equal(sub.rews, tr.rews[[0, 3, 5]])

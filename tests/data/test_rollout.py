"""Tests for the rollout engine: device scan, episode cutting, stats."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imitation_tpu.data import rollout, types
from imitation_tpu.envs import make_vec_env
from imitation_tpu.models.policies import RandomPolicy


def random_policy_for(venv):
    pol = RandomPolicy(venv.observation_space, venv.action_space)
    return pol.sample_fn(), {}


def test_collect_shapes():
    venv = make_vec_env("CartPole-v1", num_envs=4, max_episode_steps=20)
    apply_fn, params = random_policy_for(venv)
    state = venv.reset(jax.random.key(0))
    state, chunk = jax.jit(rollout.collect, static_argnums=(0, 1, 4))(
        venv, apply_fn, params, state, 32, jax.random.key(1)
    )
    assert chunk.acts.shape == (32, 4)
    assert chunk.obs.shape == (32, 4, 4)
    assert chunk.rews.shape == (32, 4)
    assert np.asarray(chunk.dones).any()  # 20-step limit within 32 steps


def test_generate_trajectories_min_episodes():
    venv = make_vec_env("CartPole-v1", num_envs=4, max_episode_steps=10)
    apply_fn, params = random_policy_for(venv)
    trajs = rollout.generate_trajectories(
        apply_fn, params, venv, rollout.make_min_episodes(7), rng=0, chunk_size=16
    )
    assert len(trajs) >= 7
    for t in trajs:
        assert isinstance(t, types.TrajectoryWithRew)
        assert len(t) <= 10
        assert t.obs.shape == (len(t) + 1, 4)


def test_generate_trajectories_min_timesteps():
    venv = make_vec_env("CartPole-v1", num_envs=2, max_episode_steps=8)
    apply_fn, params = random_policy_for(venv)
    trajs = rollout.generate_trajectories(
        apply_fn, params, venv, rollout.make_min_timesteps(50), rng=1, chunk_size=16
    )
    assert sum(len(t) for t in trajs) >= 50


def test_episode_reward_consistency():
    """Each cut episode's summed reward equals its length for CartPole."""
    venv = make_vec_env("CartPole-v1", num_envs=4, max_episode_steps=10)
    apply_fn, params = random_policy_for(venv)
    trajs = rollout.generate_trajectories(
        apply_fn, params, venv, rollout.make_min_episodes(5), rng=2, chunk_size=16
    )
    for t in trajs:
        assert t.rews.sum() == len(t)


def test_sample_until_validation():
    with pytest.raises(ValueError):
        rollout.make_sample_until(None, None)
    with pytest.raises(ValueError):
        rollout.make_min_episodes(0)
    with pytest.raises(ValueError):
        rollout.make_min_timesteps(0)
    with pytest.raises(ValueError):
        rollout.make_sample_until(min_timesteps=-1)


def test_flatten_trajectories():
    obs = np.arange(12, dtype=np.float32).reshape(6, 2)
    t1 = types.TrajectoryWithRew(
        obs=obs, acts=np.zeros((5, 1)), infos=None, terminal=True,
        rews=np.ones(5, np.float64),
    )
    t2 = types.TrajectoryWithRew(
        obs=obs[:4], acts=np.zeros((3, 1)), infos=None, terminal=False,
        rews=np.ones(3, np.float64),
    )
    flat = rollout.flatten_trajectories_with_rew([t1, t2])
    assert len(flat) == 8
    np.testing.assert_array_equal(flat.obs[:5], obs[:5])
    np.testing.assert_array_equal(flat.next_obs[:5], obs[1:6])
    assert flat.dones[4] and not flat.dones[:4].any()
    assert not flat.dones[5:].any()  # t2 not terminal


def test_rollout_stats():
    t = types.TrajectoryWithRew(
        obs=np.zeros((4, 2)), acts=np.zeros((3, 1)), infos=None, terminal=True,
        rews=np.array([1.0, 2.0, 3.0]),
    )
    stats = rollout.rollout_stats([t, t])
    assert stats["n_traj"] == 2
    assert stats["return_mean"] == 6.0
    assert stats["len_mean"] == 3.0
    assert stats["monitor_return_mean"] == 6.0


def test_discounted_sum():
    arr = np.array([1.0, 1.0, 1.0])
    assert rollout.discounted_sum(arr, 1.0) == 3.0
    assert abs(rollout.discounted_sum(arr, 0.5) - 1.75) < 1e-9
    jx = rollout.discounted_sum_jax(jnp.asarray(arr), 0.5)
    assert abs(float(jx) - 1.75) < 1e-6
    # 2D: discounts applied along axis 0
    arr2 = np.ones((3, 2))
    np.testing.assert_allclose(rollout.discounted_sum(arr2, 0.5), [1.75, 1.75])


def test_generate_transitions_truncate():
    venv = make_vec_env("CartPole-v1", num_envs=2, max_episode_steps=8)
    apply_fn, params = random_policy_for(venv)
    tr = rollout.generate_transitions(apply_fn, params, venv, 30, rng=3, chunk_size=16)
    assert len(tr) == 30


# ---------------------------------------------------------------------------
# Reference parity: completeness, seeding, unbiased episode collection
# (reference tests/data/test_rollout.py test_complete_trajectories /
# test_seed_trajectories / test_unbiased_trajectories)
# ---------------------------------------------------------------------------


def test_complete_trajectories():
    """Every returned trajectory is a complete episode: terminal flag set,
    obs one longer than acts."""
    venv = make_vec_env("CartPole-v1", num_envs=4, max_episode_steps=30)
    policy, params = random_policy_for(venv)
    trajs = rollout.generate_trajectories(
        policy, params, venv, rollout.make_min_episodes(9), rng=0
    )
    assert len(trajs) >= 9
    for t in trajs:
        # complete = ended by termination (terminal=True) or by the time
        # limit (terminal=False at exactly the horizon) — reference
        # Trajectory semantics (types.py:336: terminal False = truncation)
        assert t.terminal or len(t) == 30
        assert len(t.obs) == len(t.acts) + 1
        assert len(t) <= 30


def test_seed_trajectories_reproducible():
    venv = make_vec_env("CartPole-v1", num_envs=4, max_episode_steps=30)
    policy, params = random_policy_for(venv)
    t1 = rollout.generate_trajectories(policy, params, venv, rollout.make_min_episodes(5), rng=42)
    t2 = rollout.generate_trajectories(policy, params, venv, rollout.make_min_episodes(5), rng=42)
    t3 = rollout.generate_trajectories(policy, params, venv, rollout.make_min_episodes(5), rng=43)
    assert len(t1) == len(t2)
    for a, b in zip(t1, t2):
        np.testing.assert_array_equal(np.asarray(a.acts), np.asarray(b.acts))
        np.testing.assert_array_equal(np.asarray(a.obs), np.asarray(b.obs))
    assert len(t1) != len(t3) or any(
        not np.array_equal(np.asarray(a.acts), np.asarray(b.acts))
        for a, b in zip(t1, t3)
    )


def test_unbiased_trajectories():
    """min_timesteps collection must not under-represent long episodes
    (reference test_unbiased_trajectories: episodes completing later in the
    chunk still appear; the output is shuffled, not truncated to the
    shortest)."""
    venv = make_vec_env("CartPole-v1", num_envs=8, max_episode_steps=50)
    policy, params = random_policy_for(venv)
    trajs = rollout.generate_trajectories(
        policy, params, venv, rollout.make_min_timesteps(600), rng=1
    )
    lengths = np.array([len(t) for t in trajs])
    assert lengths.sum() >= 600
    # CartPole random-policy episodes are mostly short but occasionally long;
    # with 600+ steps collected the sample must contain length diversity
    # (a biased collector that keeps only first-finishers collapses this).
    assert lengths.max() > lengths.min()
    # order is shuffled: not sorted by length
    assert not (np.all(np.diff(lengths) >= 0) or np.all(np.diff(lengths) <= 0))

"""Reward relabeling wrappers (reference tests: test_reward_overwrite,
test_reward_fn_override — rewards/reward_wrapper.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imitation_tpu.data.rollout import RolloutChunk
from imitation_tpu.envs import make_vec_env
from imitation_tpu.rewards.reward_wrapper import (
    RewardVecEnvWrapper,
    WrappedRewardCallback,
    relabel_chunk,
)


def make_chunk(T=4, B=3, obs_dim=2):
    rng = np.random.default_rng(0)
    return RolloutChunk(
        obs=jnp.asarray(rng.normal(size=(T, B, obs_dim)).astype(np.float32)),
        acts=jnp.zeros((T, B), jnp.int32),
        rews=jnp.ones((T, B)),
        next_obs=jnp.asarray(rng.normal(size=(T, B, obs_dim)).astype(np.float32)),
        terminated=jnp.zeros((T, B), bool),
        truncated=jnp.zeros((T, B), bool),
        episode_return=jnp.zeros((T, B)),
        episode_length=jnp.zeros((T, B), jnp.int32),
        aux={},
    )


def test_relabel_chunk_replaces_rewards():
    chunk = make_chunk()

    def reward_fn(params, obs, acts, next_obs, dones):
        return obs.sum(axis=-1) * params["scale"]

    out = relabel_chunk(chunk, reward_fn, {"scale": jnp.asarray(2.0)})
    assert out.rews.shape == chunk.rews.shape
    expected = np.asarray(chunk.obs).sum(-1) * 2.0
    np.testing.assert_allclose(np.asarray(out.rews), expected, rtol=1e-6)
    # everything else untouched
    np.testing.assert_array_equal(np.asarray(out.obs), np.asarray(chunk.obs))


def test_reward_overwrite_host_wrapper():
    """Learned reward replaces env reward; true reward preserved in
    original_env_rew (reference test_reward_overwrite)."""
    from imitation_tpu.envs.gym_bridge import GymHostEnv, HostVectorEnv

    venv = HostVectorEnv(
        GymHostEnv("CartPole-v1"), num_envs=2, max_episode_steps=10
    )

    def constant_reward(state, action, next_state, done):
        return np.full(len(state), 7.5, np.float32)

    wrapped = RewardVecEnvWrapper(venv, constant_reward)
    obs = wrapped.reset(seed=0)
    for _ in range(12):
        acts = np.zeros(wrapped.num_envs, np.int64)
        out = wrapped.step(acts)
        np.testing.assert_allclose(out["reward"], 7.5)
        # CartPole true reward is 1.0 every step
        np.testing.assert_allclose(out["original_env_rew"], 1.0)
    # episode returns recorded are TRUE returns (10 steps x 1.0 at the cap)
    assert wrapped.episode_rewards
    assert all(r == 10.0 for r in wrapped.episode_rewards)


def test_wrapped_reward_callback_logs():
    class Rec:
        def __init__(self):
            self.vals = {}

        def record(self, k, v):
            self.vals[k] = v

        def dump(self, step):
            pass

    logger = Rec()
    cb = WrappedRewardCallback([2.0, 4.0], logger)
    cb.log(0)
    assert logger.vals["rollout/ep_rew_wrapped_mean"] == 3.0

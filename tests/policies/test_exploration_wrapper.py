"""Exploration wrapper tests (reference tests/policies/test_exploration)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imitation_tpu.envs import make_vec_env
from imitation_tpu.models.policies import ActorCriticPolicy, ZeroPolicy
from imitation_tpu.policies.exploration_wrapper import ExplorationWrapper


def test_invalid_probs_raise():
    venv = make_vec_env("CartPole-v1", num_envs=2)
    pol = ZeroPolicy(venv.observation_space, venv.action_space)
    with pytest.raises(ValueError):
        ExplorationWrapper(pol.sample_fn(), venv, random_prob=1.5)
    with pytest.raises(ValueError):
        ExplorationWrapper(pol.sample_fn(), venv, switch_prob=-0.1)


def test_always_random_mode():
    """random_prob=1: all modes random, actions not all zero despite zero policy."""
    venv = make_vec_env("CartPole-v1", num_envs=8, max_episode_steps=50)
    pol = ZeroPolicy(venv.observation_space, venv.action_space)
    wrapper = ExplorationWrapper(
        pol.sample_fn(), venv, random_prob=1.0, switch_prob=1.0
    )
    key = jax.random.key(0)
    env_state = venv.reset(key)
    mode = wrapper.initial_mode(jax.random.key(1))
    assert np.asarray(mode).all()
    env_state, mode, chunk = jax.jit(wrapper.collect, static_argnums=(3,))(
        {}, env_state, mode, 64, jax.random.key(2)
    )
    acts = np.asarray(chunk.acts)
    assert acts.sum() > 0  # uniform over {0,1} -> plenty of ones


def test_never_random_mode():
    """random_prob=0: zero policy's actions pass through unchanged."""
    venv = make_vec_env("CartPole-v1", num_envs=4, max_episode_steps=50)
    pol = ZeroPolicy(venv.observation_space, venv.action_space)
    wrapper = ExplorationWrapper(
        pol.sample_fn(), venv, random_prob=0.0, switch_prob=1.0
    )
    env_state = venv.reset(jax.random.key(0))
    mode = wrapper.initial_mode(jax.random.key(1))
    assert not np.asarray(mode).any()
    _, _, chunk = jax.jit(wrapper.collect, static_argnums=(3,))(
        {}, env_state, mode, 32, jax.random.key(2)
    )
    assert np.asarray(chunk.acts).sum() == 0


def test_mode_persistence_with_no_switching():
    """switch_prob=0: initial modes persist for the whole rollout."""
    venv = make_vec_env("CartPole-v1", num_envs=16, max_episode_steps=100)
    pol = ZeroPolicy(venv.observation_space, venv.action_space)
    wrapper = ExplorationWrapper(
        pol.sample_fn(), venv, random_prob=0.5, switch_prob=0.0
    )
    env_state = venv.reset(jax.random.key(0))
    mode0 = wrapper.initial_mode(jax.random.key(1))
    _, mode1, chunk = jax.jit(wrapper.collect, static_argnums=(3,))(
        {}, env_state, mode0, 50, jax.random.key(2)
    )
    np.testing.assert_array_equal(np.asarray(mode0), np.asarray(mode1))
    # envs that started in policy mode (zero) must have all-zero actions
    acts = np.asarray(chunk.acts)  # [T, B]
    policy_envs = ~np.asarray(mode0)
    assert acts[:, policy_envs].sum() == 0


def test_policy_predict_api():
    venv = make_vec_env("CartPole-v1", num_envs=2)
    policy = ActorCriticPolicy(
        observation_space=venv.observation_space, action_space=venv.action_space
    )
    variables = policy.init(jax.random.key(0))
    # batched
    acts = policy.predict(variables, np.zeros((5, 4), np.float32))
    assert acts.shape == (5,)
    # single obs
    act = policy.predict(variables, np.zeros(4, np.float32), deterministic=True)
    assert act.shape == ()
    act2 = policy.predict(variables, np.zeros(4, np.float32), deterministic=True)
    assert act == act2  # deterministic

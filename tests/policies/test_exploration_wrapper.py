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


def test_host_policy_fn_mode_persists_across_steps():
    """Host path regression (round-3 advisor): with switch_prob=0 every env
    must keep its initial mode for the WHOLE rollout even though the
    collector drives the policy step-by-step. The old implementation kept
    the mode in a Python closure executed under jax.jit, so the compiled
    program redrew the mode every step (i.i.d. mixture instead of
    Markov-switching)."""
    from imitation_tpu.data import rollout as rollout_mod
    from imitation_tpu.envs.gym_bridge import GymHostEnv, HostVectorEnv

    env = GymHostEnv("CartPole-v1")
    venv = HostVectorEnv(env, num_envs=16, max_episode_steps=200, num_threads=1)
    pol = ZeroPolicy(venv.observation_space, venv.action_space)
    wrapper = ExplorationWrapper(
        pol.sample_fn(), venv, random_prob=0.5, switch_prob=0.0
    )
    host_fn = wrapper.host_policy_fn(seed=3)
    assert getattr(host_fn, "host_stateful", False)
    collector = rollout_mod.HostCollector(venv, host_fn, {}, seed=0)
    chunk = collector.collect(64)
    acts = np.asarray(chunk.acts)  # [T=64, B=16]
    # Each env is either pure policy (all zeros) or pure random for all 64
    # steps. A random-mode env emits all-zero actions w.p. 2^-64; a
    # policy-mode env emitting any nonzero action is impossible.
    per_env_sum = acts.sum(axis=0)
    n_random = int((per_env_sum > 0).sum())
    for b in range(16):
        if per_env_sum[b] > 0:  # random mode: ~Bernoulli(1/2) actions
            assert 8 <= acts[:, b].sum() <= 56, (
                f"env {b} looks like a mixed mode: {acts[:, b].sum()}/64 ones"
            )
    # with random_prob=0.5 over 16 envs, both pure modes should appear and
    # mixed modes cannot (P[all 16 same mode] = 2^-15)
    assert 0 < n_random < 16
    # aux must be empty: the policy's log-probs would not describe
    # substituted random actions (matches the device collect path)
    assert chunk.aux == {}
    venv.close()


def test_host_policy_fn_mode_switches_when_asked():
    """switch_prob=1, random_prob=1: every step resamples into random mode;
    the zero policy's actions must be overridden essentially everywhere."""
    from imitation_tpu.data import rollout as rollout_mod
    from imitation_tpu.envs.gym_bridge import GymHostEnv, HostVectorEnv

    env = GymHostEnv("CartPole-v1")
    venv = HostVectorEnv(env, num_envs=8, max_episode_steps=200, num_threads=1)
    pol = ZeroPolicy(venv.observation_space, venv.action_space)
    wrapper = ExplorationWrapper(
        pol.sample_fn(), venv, random_prob=1.0, switch_prob=1.0
    )
    collector = rollout_mod.HostCollector(
        venv, wrapper.host_policy_fn(seed=5), {}, seed=0
    )
    acts = np.asarray(collector.collect(32).acts)
    assert acts.sum() > 0.25 * acts.size  # ~half should be ones
    venv.close()


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

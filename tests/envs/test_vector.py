"""Tests for the jit-vectorized env engine: dynamics parity + auto-reset."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imitation_tpu.envs import make_env, make_vec_env, registered_envs
from imitation_tpu.envs.vector import VectorEnv

CLASSIC = ["CartPole-v1", "Pendulum-v1", "MountainCar-v0", "MountainCarContinuous-v0", "Acrobot-v1"]


@pytest.mark.parametrize("name", CLASSIC)
def test_spaces_match_gymnasium(name):
    import gymnasium as gym

    env = make_env(name)
    genv = gym.make(name)
    gobs = genv.observation_space
    assert env.observation_space.shape == gobs.shape
    if hasattr(genv.action_space, "n"):
        assert env.action_space.n == genv.action_space.n
    else:
        assert env.action_space.shape == genv.action_space.shape
    genv.close()


@pytest.mark.parametrize("name", ["CartPole-v1", "Pendulum-v1", "MountainCar-v0"])
def test_dynamics_match_gymnasium(name):
    """Stepping the pure-JAX env from a gym state reproduces gym's next obs."""
    import gymnasium as gym

    genv = gym.make(name).unwrapped
    env = make_env(name)
    rng = np.random.default_rng(0)
    gobs, _ = genv.reset(seed=0)
    # Force our env state to match gym's internal state.
    from imitation_tpu.envs.classic import ArrayState

    for t in range(50):
        state_vec = np.asarray(genv.state, dtype=np.float32).reshape(-1)
        our_state = ArrayState(x=jnp.asarray(state_vec))
        if env.action_space.is_discrete:
            act = int(rng.integers(env.action_space.n))
            jact = jnp.asarray(act)
        else:
            act = env.action_space.to_gym().sample()
            jact = jnp.asarray(act)
        _, ts = env.step(our_state, jact, jax.random.key(t))
        gobs, grew, gterm, gtrunc, _ = genv.step(act)
        np.testing.assert_allclose(np.asarray(ts.obs), gobs, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(ts.reward), float(grew), rtol=1e-4, atol=1e-6)
        assert bool(ts.terminated) == bool(gterm)
        if gterm or gtrunc:
            gobs, _ = genv.reset(seed=t)
    genv.close()


def test_autoreset_and_terminal_obs():
    """On done, step returns reset obs; terminal_obs carries the true final obs."""
    venv = make_vec_env("CartPole-v1", num_envs=8, max_episode_steps=10)
    state = venv.reset(jax.random.key(0))
    done_seen = False
    for t in range(12):
        acts = jnp.ones((8,), jnp.int32)  # push right until fall or truncate
        state, out = venv.step_jit(state, acts)
        done = np.asarray(out.done)
        if done.any():
            done_seen = True
            term_obs = np.asarray(out.terminal_obs)[done]
            next_obs = np.asarray(out.obs)[done]
            # Reset obs are near 0 (U(-0.05,0.05)); terminal obs are not equal.
            assert not np.allclose(term_obs, next_obs)
            assert np.abs(next_obs).max() <= 0.05 + 1e-6
            # Monitor stats: length reported equals steps taken.
            lens = np.asarray(out.episode_length)[done]
            rets = np.asarray(out.episode_return)[done]
            np.testing.assert_array_equal(rets, lens.astype(np.float32))
    assert done_seen


def test_truncation_vs_termination():
    venv = make_vec_env("CartPole-v1", num_envs=4, max_episode_steps=5)
    state = venv.reset(jax.random.key(1))
    for _ in range(5):
        state, out = venv.step_jit(state, jnp.zeros((4,), jnp.int32))
    # After exactly 5 steps every surviving env must be truncated, not terminated.
    done = np.asarray(out.done)
    assert done.all()
    assert not (np.asarray(out.terminated) & np.asarray(out.truncated)).any()


def test_fixed_horizon_seals_variant():
    venv = make_vec_env("seals/CartPole-v0", num_envs=4)
    state = venv.reset(jax.random.key(0))
    terminated_any = False
    for _ in range(100):
        acts = jnp.ones((4,), jnp.int32)
        state, out = venv.step_jit(state, acts)
        terminated_any |= bool(np.asarray(out.terminated).any())
    assert not terminated_any  # seals variants never terminate early


def test_episode_return_accumulation():
    venv = make_vec_env("Pendulum-v1", num_envs=2, max_episode_steps=50)
    state = venv.reset(jax.random.key(0))
    total = np.zeros(2)
    for t in range(50):
        state, out = venv.step_jit(state, jnp.zeros((2, 1)))
        total += np.asarray(out.reward)
    assert np.asarray(out.done).all()
    np.testing.assert_allclose(np.asarray(out.episode_return), total, rtol=1e-5)


def test_registry():
    assert "CartPole-v1" in registered_envs()
    with pytest.raises(KeyError):
        make_env("NoSuchEnv-v0")

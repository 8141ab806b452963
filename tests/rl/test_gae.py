"""GAE associative-scan vs reference sequential implementation."""

import jax.numpy as jnp
import numpy as np

from imitation_tpu.ops.gae import discounted_returns, gae


def ref_gae(rews, values, next_values, terminated, dones, gamma, lam):
    T, B = rews.shape
    adv = np.zeros((T, B))
    last = np.zeros(B)
    for t in reversed(range(T)):
        delta = rews[t] + gamma * next_values[t] * (1 - terminated[t]) - values[t]
        last = delta + gamma * lam * (1 - dones[t]) * last
        adv[t] = last
    return adv


def test_gae_matches_sequential():
    rng = np.random.default_rng(0)
    T, B = 37, 5
    rews = rng.normal(size=(T, B)).astype(np.float32)
    values = rng.normal(size=(T, B)).astype(np.float32)
    next_values = rng.normal(size=(T, B)).astype(np.float32)
    terminated = rng.random((T, B)) < 0.1
    truncated = rng.random((T, B)) < 0.05
    dones = terminated | truncated
    adv, ret = gae(
        jnp.asarray(rews), jnp.asarray(values), jnp.asarray(next_values),
        jnp.asarray(terminated), jnp.asarray(dones), 0.99, 0.95,
    )
    expected = ref_gae(rews, values, next_values, terminated, dones, 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(adv), expected, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ret), expected + values, rtol=1e-4, atol=1e-4)


def test_gae_no_bootstrap_through_terminal():
    # One env, terminal at t=1: advantage at t=0 must not see t=2 rewards.
    rews = jnp.asarray([[1.0], [1.0], [100.0]])
    values = jnp.zeros((3, 1))
    next_values = jnp.zeros((3, 1))
    terminated = jnp.asarray([[False], [True], [False]])
    adv, _ = gae(rews, values, next_values, terminated, terminated, 1.0, 1.0)
    assert float(adv[0, 0]) == 2.0  # r0 + r1, not r0 + r1 + 100


def test_truncation_bootstraps_next_value():
    # Truncated at t=0 (done but not terminated): delta uses next_value.
    rews = jnp.asarray([[1.0]])
    values = jnp.asarray([[0.0]])
    next_values = jnp.asarray([[10.0]])
    terminated = jnp.asarray([[False]])
    dones = jnp.asarray([[True]])
    adv, _ = gae(rews, values, next_values, terminated, dones, 0.5, 0.9)
    assert abs(float(adv[0, 0]) - (1.0 + 0.5 * 10.0)) < 1e-6


def test_discounted_returns():
    rews = jnp.asarray([[1.0], [1.0], [1.0]])
    dones = jnp.zeros((3, 1))
    ret = discounted_returns(rews, dones, 0.5)
    np.testing.assert_allclose(np.asarray(ret[:, 0]), [1.75, 1.5, 1.0], rtol=1e-6)

"""Pallas GAE kernel vs associative-scan reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from imitation_tpu.ops.gae import gae
from imitation_tpu.ops.gae_pallas import gae_pallas


def test_pallas_gae_matches_reference_interpret():
    rng = np.random.default_rng(0)
    T, B = 32, 8
    rews = rng.normal(size=(T, B)).astype(np.float32)
    values = rng.normal(size=(T, B)).astype(np.float32)
    next_values = rng.normal(size=(T, B)).astype(np.float32)
    terminated = (rng.random((T, B)) < 0.1).astype(np.float32)
    dones = np.maximum(terminated, (rng.random((T, B)) < 0.05)).astype(np.float32)
    adv_ref, ret_ref = gae(
        jnp.asarray(rews), jnp.asarray(values), jnp.asarray(next_values),
        jnp.asarray(terminated), jnp.asarray(dones), 0.99, 0.95,
    )
    adv_pl, ret_pl = gae_pallas(
        jnp.asarray(rews), jnp.asarray(values), jnp.asarray(next_values),
        jnp.asarray(terminated), jnp.asarray(dones), 0.99, 0.95,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(adv_pl), np.asarray(adv_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ret_pl), np.asarray(ret_ref), rtol=1e-4, atol=1e-4)

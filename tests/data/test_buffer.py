"""Replay buffer tests (reference tests/data/test_buffer.py): wraparound,
capacity overflow, sampling distribution."""

import jax
import jax.numpy as jnp
import numpy as np

from imitation_tpu.data.buffer import ReplayBuffer
from imitation_tpu.data.types import TransitionBatch


def make_batch(start, n):
    r = jnp.arange(start, start + n, dtype=jnp.float32)
    return TransitionBatch(
        obs=r[:, None],
        acts=r[:, None],
        next_obs=r[:, None],
        dones=jnp.zeros(n),
        rews=r,
    )


def test_store_and_size():
    buf = ReplayBuffer(capacity=10)
    state = buf.init_state(make_batch(0, 1))
    state = buf.store(state, make_batch(0, 4))
    assert int(state.size) == 4
    assert int(state.idx) == 4
    state = buf.store(state, make_batch(4, 4))
    assert int(state.size) == 8


def test_wraparound():
    buf = ReplayBuffer(capacity=5)
    state = buf.init_state(make_batch(0, 1))
    state = buf.store(state, make_batch(0, 4))  # [0,1,2,3,_]
    state = buf.store(state, make_batch(4, 3))  # wraps: [5,6,2,3,4]
    assert int(state.size) == 5
    assert int(state.idx) == 2
    stored = np.sort(np.asarray(state.data.rews))
    np.testing.assert_array_equal(stored, [2, 3, 4, 5, 6])


def test_overflow_batch_keeps_last_capacity():
    buf = ReplayBuffer(capacity=3)
    state = buf.init_state(make_batch(0, 1))
    state = buf.store(state, make_batch(0, 10))
    stored = np.sort(np.asarray(state.data.rews))
    np.testing.assert_array_equal(stored, [7, 8, 9])
    assert int(state.size) == 3


def test_sample_only_from_filled():
    buf = ReplayBuffer(capacity=100)
    state = buf.init_state(make_batch(0, 1))
    state = buf.store(state, make_batch(0, 5))
    sample = buf.sample(state, jax.random.key(0), 64)
    vals = np.asarray(sample.rews)
    assert set(np.unique(vals)).issubset({0.0, 1.0, 2.0, 3.0, 4.0})


def test_sample_roughly_uniform():
    buf = ReplayBuffer(capacity=8)
    state = buf.init_state(make_batch(0, 1))
    state = buf.store(state, make_batch(0, 8))
    sample = buf.sample(state, jax.random.key(1), 8000)
    counts = np.bincount(np.asarray(sample.rews).astype(int), minlength=8)
    assert counts.min() > 800  # each of 8 values ~1000 +- noise


def test_store_is_jittable():
    buf = ReplayBuffer(capacity=6)
    state = buf.init_state(make_batch(0, 1))
    store = jax.jit(buf.store)
    for i in range(4):
        state = store(state, make_batch(i * 2, 2))
    assert int(state.size) == 6


def test_empty_sample_is_poisoned():
    # Reference raises on sampling an empty buffer (buffer.py:216-237);
    # inside jit we poison instead of silently returning zero rows.
    buf = ReplayBuffer(capacity=10)
    state = buf.init_state(make_batch(0, 1))
    out = jax.jit(buf.sample, static_argnums=2)(state, jax.random.key(0), 4)
    assert np.all(np.isnan(out.obs))
    assert np.all(np.isnan(out.rews))


def test_empty_sample_poison_int_leaves():
    r = jnp.arange(3)
    batch = TransitionBatch(
        obs=jnp.zeros((3, 1)),
        acts=r.astype(jnp.int32),
        next_obs=jnp.zeros((3, 1)),
        dones=jnp.zeros(3),
        rews=jnp.zeros(3),
    )
    buf = ReplayBuffer(capacity=8)
    state = buf.init_state(batch)
    out = buf.sample(state, jax.random.key(0), 4)
    assert np.all(np.asarray(out.acts) == np.iinfo(np.int32).max)


def test_sample_checked_raises_on_empty():
    import pytest

    buf = ReplayBuffer(capacity=10)
    state = buf.init_state(make_batch(0, 1))
    with pytest.raises(ValueError, match="empty replay buffer"):
        buf.sample_checked(state, jax.random.key(0), 4)


def test_sample_clean_after_store():
    buf = ReplayBuffer(capacity=10)
    state = buf.init_state(make_batch(0, 1))
    state = buf.store(state, make_batch(0, 4))
    out = buf.sample_checked(state, jax.random.key(0), 16)
    assert np.all(np.isfinite(out.obs))
    assert set(np.asarray(out.rews).tolist()) <= {0.0, 1.0, 2.0, 3.0}

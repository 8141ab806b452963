"""On-device FIFO replay buffers.

Counterpart of reference ``data/buffer.py`` (``Buffer``/``ReplayBuffer``,
buffer.py:30-416): a fixed-capacity ring over struct-of-arrays with
wraparound store and uniform sampling. Here the storage is a
``TransitionBatch`` pytree of fixed HBM arrays and all operations are pure
index arithmetic inside jit — store is a scatter at
``(idx + arange(k)) % capacity``, sampling is a random gather. The buffer
state is itself a pytree, so it shards over a mesh like any other state
(replay shards per host in the distributed layout).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from imitation_tpu.data.types import TransitionBatch


@struct.dataclass
class BufferState:
    data: TransitionBatch  # leaves [capacity, ...]
    idx: jnp.ndarray  # int32 next write position
    size: jnp.ndarray  # int32 current fill level


@dataclasses.dataclass(frozen=True)
class ReplayBuffer:
    """Fixed-capacity device ring buffer of transitions."""

    capacity: int

    def init_state(self, example: TransitionBatch) -> BufferState:
        """Allocates zeroed storage shaped like ``example`` rows."""
        data = jax.tree.map(
            lambda x: jnp.zeros((self.capacity,) + x.shape[1:], x.dtype), example
        )
        return BufferState(
            data=data, idx=jnp.zeros((), jnp.int32), size=jnp.zeros((), jnp.int32)
        )

    def store(self, state: BufferState, batch: TransitionBatch) -> BufferState:
        """FIFO store with wraparound (reference buffer.py:147-214).

        If the batch exceeds capacity only the last ``capacity`` rows are
        retained, matching the reference's chunked-store semantics.
        """
        k = batch.batch_size
        if k >= self.capacity:
            data = jax.tree.map(lambda x: x[-self.capacity:], batch)
            return BufferState(
                data=data,
                idx=jnp.zeros((), jnp.int32),
                size=jnp.asarray(self.capacity, jnp.int32),
            )
        pos = (state.idx + jnp.arange(k)) % self.capacity
        data = jax.tree.map(lambda buf, new: buf.at[pos].set(new), state.data, batch)
        return BufferState(
            data=data,
            idx=(state.idx + k) % self.capacity,
            size=jnp.minimum(state.size + k, self.capacity),
        )

    def sample(
        self, state: BufferState, key: jax.Array, n: int
    ) -> TransitionBatch:
        """Uniform with-replacement sample of ``n`` stored rows
        (reference buffer.py:216-237).

        The reference raises on sampling an empty buffer. Inside jit we
        cannot raise on a traced predicate, so an empty-buffer sample is
        *poisoned* instead: float leaves become NaN and integer leaves the
        dtype's max value, so downstream losses/indices blow up loudly
        rather than silently training on all-zero rows of unfilled storage.
        Eager call sites should use :meth:`sample_checked`.
        """
        idx = jax.random.randint(key, (n,), 0, jnp.maximum(state.size, 1))
        empty = state.size == 0

        def _poison(x):
            rows = x[idx]
            if jnp.issubdtype(rows.dtype, jnp.floating):
                bad = jnp.asarray(jnp.nan, rows.dtype)
            elif jnp.issubdtype(rows.dtype, jnp.integer):
                bad = jnp.asarray(jnp.iinfo(rows.dtype).max, rows.dtype)
            else:  # bool dones etc. — nothing poisonous representable
                return rows
            return jnp.where(empty, bad, rows)

        return jax.tree.map(_poison, state.data)

    def sample_checked(
        self, state: BufferState, key: jax.Array, n: int
    ) -> TransitionBatch:
        """Eager-path sample that raises on an empty buffer like the
        reference (buffer.py:216-237 ``assert self.size() > 0``)."""
        if int(state.size) == 0:
            raise ValueError(
                "Cannot sample from an empty replay buffer; store transitions "
                "first (e.g. call train_gen())."
            )
        return self.sample(state, key, n)

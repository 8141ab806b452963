"""Core environment protocol for the jit-vectorized env engine.

The reference delegates environment execution to Gymnasium + SB3's
``SubprocVecEnv`` (reference: src/imitation/util/util.py:80-166) — Python envs
stepped in forked worker processes, 8 at a time. The TPU-native design instead
makes the environment itself a pure function: ``step: (params, state, action,
key) -> (state', TimeStep)`` where ``state`` is a pytree in HBM. Thousands of
env instances then run in lockstep under ``vmap`` inside a single jitted
program — no process boundary, no host↔device transfer per step.

Episode-boundary semantics follow Gymnasium's terminated/truncated split so
that value bootstrapping on truncation is exact, and the vector engine's
auto-reset reproduces the reference's ``terminal_observation`` contract
(reference: src/imitation/rewards/reward_wrapper.py:93-109).
"""

from __future__ import annotations

import abc
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class Space:
    """Static description of an observation/action space (pytree-static).

    A minimal, jit-friendly stand-in for gymnasium spaces. ``n`` is None for
    continuous (Box) spaces. ``low``/``high`` are numpy arrays (host
    constants), not traced.
    """

    shape: Tuple[int, ...] = struct.field(pytree_node=False)
    dtype: Any = struct.field(pytree_node=False)
    n: Optional[int] = struct.field(pytree_node=False, default=None)
    low: Optional[np.ndarray] = struct.field(pytree_node=False, default=None)
    high: Optional[np.ndarray] = struct.field(pytree_node=False, default=None)

    @property
    def is_discrete(self) -> bool:
        return self.n is not None

    @property
    def flat_dim(self) -> int:
        if self.is_discrete:
            return int(self.n)
        return int(np.prod(self.shape)) if self.shape else 1

    def sample(self, key: jax.Array) -> jnp.ndarray:
        if self.is_discrete:
            return jax.random.randint(key, self.shape, 0, self.n)
        low = jnp.asarray(self.low if self.low is not None else -1.0)
        high = jnp.asarray(self.high if self.high is not None else 1.0)
        low = jnp.broadcast_to(low, self.shape)
        high = jnp.broadcast_to(high, self.shape)
        u = jax.random.uniform(key, self.shape, dtype=jnp.float32)
        return low + u * (high - low)

    def contains(self, x) -> bool:
        x = np.asarray(x)
        if self.is_discrete:
            return bool((x >= 0).all() and (x < self.n).all())
        ok = x.shape[-len(self.shape):] == self.shape if self.shape else True
        if self.low is not None:
            ok = ok and bool((x >= self.low - 1e-6).all())
        if self.high is not None:
            ok = ok and bool((x <= self.high + 1e-6).all())
        return ok

    def to_gym(self):
        """Converts to an equivalent gymnasium space (host interop)."""
        import gymnasium as gym

        if self.is_discrete:
            return gym.spaces.Discrete(self.n)
        low = self.low if self.low is not None else -np.inf
        high = self.high if self.high is not None else np.inf
        return gym.spaces.Box(
            low=np.broadcast_to(np.asarray(low, np.float32), self.shape),
            high=np.broadcast_to(np.asarray(high, np.float32), self.shape),
            shape=self.shape,
            dtype=self.dtype,
        )

    @classmethod
    def discrete(cls, n: int) -> "Space":
        return cls(shape=(), dtype=np.int32, n=n)

    @classmethod
    def box(cls, low, high, shape: Tuple[int, ...], dtype=np.float32) -> "Space":
        return cls(
            shape=tuple(shape),
            dtype=dtype,
            low=np.asarray(low, dtype),
            high=np.asarray(high, dtype),
        )

    @classmethod
    def from_gym(cls, space) -> "Space":
        import gymnasium as gym

        if isinstance(space, gym.spaces.Discrete):
            return cls.discrete(int(space.n))
        if isinstance(space, gym.spaces.Box):
            return cls(
                shape=tuple(space.shape),
                dtype=space.dtype.type,
                low=np.asarray(space.low),
                high=np.asarray(space.high),
            )
        raise NotImplementedError(f"unsupported gym space: {space}")


@struct.dataclass
class DictSpace:
    """Dict observation space: mapping name -> Space (pytree-static).

    The jit-friendly counterpart of gym.spaces.Dict — observations are plain
    dict pytrees; policies flatten-and-concatenate leaves (the reference's
    CombinedExtractor behavior, SB3 via policies/base.py:92-105).
    """

    spaces: Any = struct.field(pytree_node=False)  # Dict[str, Space]

    @property
    def is_discrete(self) -> bool:
        return False

    @property
    def flat_dim(self) -> int:
        return sum(s.flat_dim for s in self.spaces.values())

    def keys(self):
        return self.spaces.keys()

    def __getitem__(self, k: str) -> "Space":
        return self.spaces[k]

    @property
    def shape(self):
        return {k: s.shape for k, s in self.spaces.items()}

    @classmethod
    def from_gym(cls, space) -> "DictSpace":
        return cls(spaces={k: Space.from_gym(v) for k, v in space.spaces.items()})


@struct.dataclass
class TimeStep:
    """Result of one env step (pre-auto-reset).

    ``terminated`` — true terminal state reached (value target 0).
    ``truncated`` — time-limit cutoff (bootstrap from next value).
    """

    obs: Any
    reward: jnp.ndarray
    terminated: jnp.ndarray
    truncated: jnp.ndarray

    @property
    def done(self) -> jnp.ndarray:
        return jnp.logical_or(self.terminated, self.truncated)


class Env(abc.ABC):
    """A pure-functional environment.

    Subclasses define ``observation_space``/``action_space``, a default
    horizon, and the two pure functions ``reset``/``step``. Both must be
    trace-safe: no Python branching on traced values, static shapes only.
    """

    max_episode_steps: Optional[int] = None

    @property
    @abc.abstractmethod
    def observation_space(self) -> Space:
        ...

    @property
    @abc.abstractmethod
    def action_space(self) -> Space:
        ...

    @abc.abstractmethod
    def reset(self, key: jax.Array) -> Tuple[Any, Any]:
        """Returns (obs, state)."""

    @abc.abstractmethod
    def step(self, state: Any, action: jnp.ndarray, key: jax.Array) -> Tuple[Any, TimeStep]:
        """Returns (state', TimeStep). Must NOT handle time limits — the
        vector engine tracks step counts and sets ``truncated``."""

    # -- conveniences ------------------------------------------------------
    @property
    def name(self) -> str:
        return type(self).__name__

    def obs_of(self, state: Any) -> Any:
        """Recomputes the observation for a state (used at reset boundaries)."""
        raise NotImplementedError

"""The jit-vectorized environment engine.

Replaces the reference's SB3 ``VecEnv`` stack — ``DummyVecEnv`` /
``SubprocVecEnv`` workers + ``Monitor`` + ``BufferingWrapper`` (reference:
src/imitation/util/util.py:80-166, src/imitation/data/wrappers.py:13-208) —
with a single pure-functional vectorized environment: B env instances stored
as one batched pytree in HBM, stepped in lockstep by ``vmap`` inside whatever
jitted program calls it (rollout scan, actor-learner, evaluation).

Semantics preserved from the reference stack:

* **Auto-reset with terminal observation**: when an episode ends, ``step``
  returns the *reset* observation as the next obs, while ``terminal_obs``
  carries the true final observation — exactly the information SB3 puts in
  ``info["terminal_observation"]`` and the reference's reward relabeling
  recovers (reference: src/imitation/rewards/reward_wrapper.py:93-109).
* **Monitor episode stats**: per-env accumulated true return/length, reported
  on the step an episode finishes (reference relies on SB3 ``Monitor`` infos
  for ``monitor_return_*`` stats, src/imitation/data/rollout.py:534-547).
* **terminated vs truncated**: kept separate so value bootstrapping at time
  limits is exact (SB3 handles this via ``TimeLimit.truncated`` infos).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from imitation_tpu.envs.base import Env, Space, TimeStep


@struct.dataclass
class VecEnvState:
    """Batched state of B environments (a pytree in HBM)."""

    env_state: Any  # pytree, leaves [B, ...]
    obs: Any  # [B, obs...] current observation (post-reset)
    t: jnp.ndarray  # [B] int32 steps since episode start
    episode_return: jnp.ndarray  # [B] f32 accumulated true reward
    key: jax.Array


@struct.dataclass
class VecStep:
    """Result of one vectorized step, after auto-reset."""

    obs: Any  # [B, ...] next obs AFTER auto-reset
    terminal_obs: Any  # [B, ...] true next obs (pre-reset); == obs if not done
    reward: jnp.ndarray  # [B] f32
    terminated: jnp.ndarray  # [B] bool
    truncated: jnp.ndarray  # [B] bool
    episode_return: jnp.ndarray  # [B] f32 — valid where done
    episode_length: jnp.ndarray  # [B] int32 — valid where done

    @property
    def done(self) -> jnp.ndarray:
        return jnp.logical_or(self.terminated, self.truncated)


def _where_tree(cond: jnp.ndarray, a, b):
    """Per-env select over batched pytrees; cond is [B]."""

    def sel(x, y):
        c = cond.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(c, x, y)

    return jax.tree.map(sel, a, b)


class VectorEnv:
    """B lockstep instances of a pure-JAX Env with auto-reset + monitor.

    All methods are pure functions of (state, inputs) — wrap in ``jax.jit``
    or call from within a jitted scan. ``num_envs`` is static.
    """

    def __init__(
        self,
        env: Env,
        num_envs: int,
        max_episode_steps: Optional[int] = None,
    ):
        self.env = env
        self.num_envs = num_envs
        self.max_episode_steps = (
            max_episode_steps if max_episode_steps is not None else env.max_episode_steps
        )

    @property
    def observation_space(self) -> Space:
        return self.env.observation_space

    @property
    def action_space(self) -> Space:
        return self.env.action_space

    def reset(self, key: jax.Array) -> VecEnvState:
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, self.num_envs)
        obs, env_state = jax.vmap(self.env.reset)(keys)
        B = self.num_envs
        return VecEnvState(
            env_state=env_state,
            obs=obs,
            t=jnp.zeros((B,), jnp.int32),
            episode_return=jnp.zeros((B,), jnp.float32),
            key=key,
        )

    def step(
        self, state: VecEnvState, actions: jnp.ndarray
    ) -> Tuple[VecEnvState, VecStep]:
        B = self.num_envs
        key, k_step, k_reset = jax.random.split(state.key, 3)
        step_keys = jax.random.split(k_step, B)
        new_env_state, ts = jax.vmap(self.env.step)(state.env_state, actions, step_keys)

        t = state.t + 1
        truncated = ts.truncated
        if self.max_episode_steps is not None:
            # Gymnasium semantics: truncation does not fire if already terminated.
            truncated = jnp.logical_or(
                truncated,
                jnp.logical_and(t >= self.max_episode_steps, ~ts.terminated),
            )
        done = jnp.logical_or(ts.terminated, truncated)

        ep_return = state.episode_return + ts.reward
        ep_length = t

        # Auto-reset the finished envs.
        reset_keys = jax.random.split(k_reset, B)
        reset_obs, reset_state = jax.vmap(self.env.reset)(reset_keys)
        next_env_state = _where_tree(done, reset_state, new_env_state)
        next_obs = _where_tree(done, reset_obs, ts.obs)

        new_state = VecEnvState(
            env_state=next_env_state,
            obs=next_obs,
            t=jnp.where(done, 0, t),
            episode_return=jnp.where(done, 0.0, ep_return),
            key=key,
        )
        out = VecStep(
            obs=next_obs,
            terminal_obs=ts.obs,
            reward=ts.reward,
            terminated=ts.terminated,
            truncated=truncated,
            episode_return=ep_return,
            episode_length=ep_length,
        )
        return new_state, out

    # -- convenience: jitted closures -------------------------------------
    @functools.cached_property
    def reset_jit(self) -> Callable[[jax.Array], VecEnvState]:
        return jax.jit(self.reset)

    @functools.cached_property
    def step_jit(self):
        return jax.jit(self.step)

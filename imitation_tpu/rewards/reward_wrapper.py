"""Reward relabeling wrappers.

Counterpart of reference ``rewards/reward_wrapper.py`` (134 LoC,
``RewardVecEnvWrapper``): replace the env reward with a learned reward at
step time, preserving the true reward in ``info["original_env_rew"]``.

In the TPU engine this is NOT a per-step wrapper — relabeling is fused into
the rollout program as a batched map over the collected chunk
(``relabel_chunk`` below; used by rl/ppo.py via ``reward_fn``). The
``RewardVecEnvWrapper`` class here serves the host gym-bridge path.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from imitation_tpu.data.rollout import RolloutChunk
from imitation_tpu.envs.gym_bridge import HostVectorEnv
from imitation_tpu.rewards.reward_function import RewardFn
from imitation_tpu.rl.common import RelabelRewardFn


def relabel_chunk(
    chunk: RolloutChunk,
    reward_fn: RelabelRewardFn,
    reward_params: Any,
) -> RolloutChunk:
    """Relabels a [T, B] rollout chunk with a learned reward — one fused
    batched reward forward over all T*B transitions (device-side equivalent
    of the reference's per-step ``RewardVecEnvWrapper.step_wait``,
    reward_wrapper.py:92-133)."""
    T, B = chunk.rews.shape
    flat = lambda x: x.reshape((T * B,) + x.shape[2:])
    rews = reward_fn(
        reward_params,
        jax.tree.map(flat, chunk.obs),
        flat(chunk.acts),
        jax.tree.map(flat, chunk.next_obs),
        flat(chunk.dones.astype(jnp.float32)),
    ).reshape(T, B)
    return chunk.replace(rews=rews)


class WrappedRewardCallback:
    """Logs original (true) episode returns during relabeled training
    (reference reward_wrapper.py:15-37)."""

    def __init__(self, episode_rewards, logger=None):
        self.episode_rewards = episode_rewards
        self.logger = logger

    def log(self, step: int = 0) -> None:
        if len(self.episode_rewards) == 0 or self.logger is None:
            return
        mean = sum(self.episode_rewards) / len(self.episode_rewards)
        self.logger.record("rollout/ep_rew_wrapped_mean", mean)
        self.logger.dump(step)


class RewardVecEnvWrapper:
    """Host vector env with learned reward substituted at step time
    (reference reward_wrapper.py:40-133). Gym-bridge path only."""

    def __init__(
        self,
        venv: HostVectorEnv,
        reward_fn: RewardFn,
        ep_history: int = 100,
    ):
        self.venv = venv
        self.reward_fn = reward_fn
        self.episode_rewards = []
        self._ep_history = ep_history
        self._cumul_rew = np.zeros(venv.num_envs)
        self._last_obs = None
        self._actions = None

    @property
    def num_envs(self) -> int:
        return self.venv.num_envs

    @property
    def observation_space(self):
        return self.venv.observation_space

    @property
    def action_space(self):
        return self.venv.action_space

    def make_log_callback(self, logger=None) -> WrappedRewardCallback:
        return WrappedRewardCallback(self.episode_rewards, logger)

    def reset(self, **kwargs):
        obs = self.venv.reset(**kwargs)
        self._last_obs = obs
        self._cumul_rew[:] = 0
        return obs

    def step(self, actions: np.ndarray):
        out = self.venv.step(actions)
        # True next obs at episode ends is terminal_obs (reference :95-109).
        rews = self.reward_fn(
            self._last_obs,
            np.asarray(actions),
            out["terminal_obs"],
            (out["terminated"] | out["truncated"]).astype(np.float32),
        )
        # Track true returns for logging (reference :110-126).
        self._cumul_rew += out["reward"]
        done = out["terminated"] | out["truncated"]
        for i in np.flatnonzero(done):
            self.episode_rewards.append(self._cumul_rew[i])
            self._cumul_rew[i] = 0
        while len(self.episode_rewards) > self._ep_history:
            self.episode_rewards.pop(0)
        out = dict(out)
        out["original_env_rew"] = out["reward"]
        out["reward"] = np.asarray(rews, np.float32)
        self._last_obs = out["obs"]
        return out

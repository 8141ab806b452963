"""Python interface to the C++ batched env engine.

``CppVectorEnv`` exposes the same host-vector-env contract as
``HostVectorEnv`` (``is_host = True``, dict-of-arrays step output), so
rollout code is agnostic. One ``step`` call crosses into C once for all B
envs — the native replacement for the reference's per-env subprocess
round-trip.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from imitation_tpu.envs.base import Space

ENV_TYPES = {
    "CartPole-v1": (0, False),
    "CartPole-v0": (0, False),
    "seals/CartPole-v0": (0, True),
    "Pendulum-v1": (1, False),
    "seals/Pendulum-v0": (1, False),
    "MountainCar-v0": (2, False),
    "seals/MountainCar-v0": (2, True),
    "MountainCarContinuous-v0": (3, False),
}

_SPACES = {
    0: (Space.box(-np.inf, np.inf, (4,)), Space.discrete(2)),
    1: (
        Space.box(np.array([-1, -1, -8], np.float32), np.array([1, 1, 8], np.float32), (3,)),
        Space.box(-2.0, 2.0, (1,)),
    ),
    2: (Space.box(-np.inf, np.inf, (2,)), Space.discrete(3)),
    3: (Space.box(-np.inf, np.inf, (2,)), Space.box(-1.0, 1.0, (1,))),
}


class CppVectorEnv:
    """Batched C++ classic-control envs behind the host-vector-env contract."""

    is_host = True

    def __init__(
        self,
        env_name: str,
        num_envs: int = 8,
        max_episode_steps: Optional[int] = None,
        seed: int = 0,
        num_threads: Optional[int] = None,
    ):
        from imitation_tpu.native.build import load_library

        if env_name not in ENV_TYPES:
            raise KeyError(
                f"no C++ engine for {env_name!r}; available: {sorted(ENV_TYPES)}"
            )
        env_type, fixed_horizon = ENV_TYPES[env_name]
        self._lib = load_library()
        if num_threads is None:
            num_threads = min(8, os.cpu_count() or 1)
        self.num_envs = num_envs
        self._handle = ctypes.c_void_p(
            self._lib.engine_create(
                env_type, num_envs, max_episode_steps or 0,
                int(fixed_horizon), seed, num_threads,
            )
        )
        self.observation_space, self.action_space = _SPACES[env_type]
        self._obs_dim = self._lib.engine_obs_dim(self._handle)
        self._act_dim = max(1, self._lib.engine_act_dim(self._handle))
        self.max_episode_steps = max_episode_steps

        B = num_envs
        f32 = np.float32
        self._obs = np.zeros((B, self._obs_dim), f32)
        self._term_obs = np.zeros((B, self._obs_dim), f32)
        self._reward = np.zeros(B, f32)
        self._terminated = np.zeros(B, np.uint8)
        self._truncated = np.zeros(B, np.uint8)
        self._ep_ret = np.zeros(B, f32)
        self._ep_len = np.zeros(B, np.int32)

    @staticmethod
    def _ptr(a, typ):
        return a.ctypes.data_as(ctypes.POINTER(typ))

    def reset(self, seed: Optional[int] = None) -> np.ndarray:
        self._lib.engine_reset(self._handle, self._ptr(self._obs, ctypes.c_float))
        return self._obs.copy()

    def step(self, actions: np.ndarray):
        acts = np.ascontiguousarray(
            np.asarray(actions, np.float32).reshape(self.num_envs, -1)
        )
        self._lib.engine_step(
            self._handle,
            self._ptr(acts, ctypes.c_float),
            self._ptr(self._obs, ctypes.c_float),
            self._ptr(self._term_obs, ctypes.c_float),
            self._ptr(self._reward, ctypes.c_float),
            self._ptr(self._terminated, ctypes.c_uint8),
            self._ptr(self._truncated, ctypes.c_uint8),
            self._ptr(self._ep_ret, ctypes.c_float),
            self._ptr(self._ep_len, ctypes.c_int32),
        )
        return dict(
            obs=self._obs.copy(),
            terminal_obs=self._term_obs.copy(),
            reward=self._reward.copy(),
            terminated=self._terminated.astype(bool),
            truncated=self._truncated.astype(bool),
            episode_return=self._ep_ret.copy(),
            episode_length=self._ep_len.copy(),
        )

    def close(self):
        if self._handle:
            self._lib.engine_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def make_cpp_vec_env(env_name: str, num_envs: int = 8, **kwargs) -> CppVectorEnv:
    return CppVectorEnv(env_name, num_envs=num_envs, **kwargs)

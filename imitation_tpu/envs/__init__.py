"""Jit-vectorized environment engine (TPU-native replacement for SB3 VecEnv)."""

from imitation_tpu.envs.base import Env, Space, TimeStep
from imitation_tpu.envs.registry import make_env, make_vec_env, register, registered_envs
from imitation_tpu.envs.vector import VecEnvState, VecStep, VectorEnv

__all__ = [
    "Env",
    "Space",
    "TimeStep",
    "VectorEnv",
    "VecEnvState",
    "VecStep",
    "make_env",
    "make_vec_env",
    "register",
    "registered_envs",
]

"""Scripted expert policies for testing and synthetic-expert training.

The reference downloads pretrained SB3 experts from HuggingFace hub and
caches rollouts (reference: src/imitation/testing/expert_trajectories.py:55-113).
This environment has no network egress, so instead we ship closed-form
near-optimal controllers for the classic-control envs — deterministic, pure
JAX, usable both as test experts and as DAgger's synthetic expert. Each
exposes the standard rollout policy interface ``(params, obs, key) ->
(acts, aux)``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from imitation_tpu.data import rollout as rollout_mod
from imitation_tpu.data import types
from imitation_tpu.envs.vector import VectorEnv


def cartpole_expert_fn(params, obs: jnp.ndarray, key) -> Tuple[jnp.ndarray, dict]:
    """PD controller on (theta, theta_dot) + cart recentring; balances CartPole
    indefinitely (return 500 on CartPole-v1)."""
    x, x_dot, theta, theta_dot = obs[:, 0], obs[:, 1], obs[:, 2], obs[:, 3]
    score = theta + 0.5 * theta_dot + 0.05 * x + 0.1 * x_dot
    acts = (score > 0).astype(jnp.int32)
    return acts, {}


def pendulum_expert_fn(params, obs: jnp.ndarray, key) -> Tuple[jnp.ndarray, dict]:
    """Energy-shaping swing-up with a PD stabilizer near the top.

    Typical return around -150, near the best achievable for Pendulum-v1.
    """
    cos_th, sin_th, thdot = obs[:, 0], obs[:, 1], obs[:, 2]
    th = jnp.arctan2(sin_th, cos_th)
    g, m, l = 10.0, 1.0, 1.0
    # mechanical energy relative to the upright position
    energy = 0.5 * m * l**2 * thdot**2 + m * g * l * (cos_th - 1.0)
    swing_u = 2.0 * jnp.sign(thdot * (-energy))
    pd_u = -16.0 * th - 4.0 * thdot
    near_top = (jnp.abs(th) < 0.4)
    u = jnp.where(near_top, pd_u, swing_u)
    acts = jnp.clip(u, -2.0, 2.0)[:, None]
    return acts, {}


def mountain_car_expert_fn(params, obs: jnp.ndarray, key) -> Tuple[jnp.ndarray, dict]:
    """Bang-bang energy pumping: accelerate along current velocity."""
    vel = obs[:, 1]
    acts = jnp.where(vel >= 0, 2, 0).astype(jnp.int32)
    return acts, {}


EXPERTS = {
    "CartPole-v1": cartpole_expert_fn,
    "CartPole-v0": cartpole_expert_fn,
    "seals/CartPole-v0": cartpole_expert_fn,
    "Pendulum-v1": pendulum_expert_fn,
    "seals/Pendulum-v0": pendulum_expert_fn,
    "MountainCar-v0": mountain_car_expert_fn,
    "seals/MountainCar-v0": mountain_car_expert_fn,
}


def expert_for(env_name: str):
    """Returns the scripted expert rollout fn for ``env_name``."""
    if env_name not in EXPERTS:
        raise KeyError(f"no scripted expert for {env_name!r}")
    return EXPERTS[env_name]


def generate_expert_trajectories(
    env_name: str,
    venv: VectorEnv,
    min_episodes: int = 10,
    seed: int = 0,
) -> Sequence[types.TrajectoryWithRew]:
    """Rolls out the scripted expert (the reference's
    ``lazy_generate_expert_trajectories`` analogue, without the HF download)."""
    fn = expert_for(env_name)
    return rollout_mod.generate_trajectories(
        fn, {}, venv, rollout_mod.make_min_episodes(min_episodes), rng=seed
    )

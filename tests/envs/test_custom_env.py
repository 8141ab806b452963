"""Custom pure-JAX env end-to-end (docs/custom_envs.md Option 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import struct

from imitation_tpu.envs import Env, Space, TimeStep
from imitation_tpu.envs.vector import VectorEnv


@struct.dataclass
class PointState:
    x: jnp.ndarray


class PointEnv(Env):
    """Move a point toward the origin; reward = -|x|^2."""

    max_episode_steps = 20

    @property
    def observation_space(self):
        return Space.box(-2.0, 2.0, (2,))

    @property
    def action_space(self):
        return Space.discrete(3)  # left / stay / right on dim 0

    def reset(self, key):
        x = jax.random.uniform(key, (2,), minval=-1.0, maxval=1.0)
        return x, PointState(x=x)

    def step(self, state, action, key):
        dx = jnp.stack([(action - 1) * 0.1, jnp.zeros(())])
        x = jnp.clip(state.x + dx, -2.0, 2.0)
        f = jnp.zeros((), bool)
        return PointState(x=x), TimeStep(
            obs=x, reward=-jnp.sum(x**2), terminated=f, truncated=f
        )


def test_custom_env_rollout_and_ppo():
    venv = VectorEnv(PointEnv(), num_envs=8)
    from imitation_tpu.models.policies import ActorCriticPolicy
    from imitation_tpu.rl.ppo import PPO, PPOConfig

    policy = ActorCriticPolicy(
        observation_space=venv.observation_space, action_space=venv.action_space
    )
    ppo = PPO(venv, policy, PPOConfig(n_steps=40, n_minibatches=4, n_epochs=4,
                                      learning_rate=1e-3))
    state = ppo.init_state(jax.random.key(0))
    returns = []
    for _ in range(15):
        state, m = ppo._train_step_jit(state)
        r = float(m["ep_return_mean"])
        if np.isfinite(r):
            returns.append(r)
    # learned to move toward the origin: later returns better than early
    assert np.mean(returns[-3:]) > np.mean(returns[:3])


def test_custom_env_registration():
    from imitation_tpu.envs import make_vec_env, register

    try:
        register("PointTest-v0", PointEnv)
    except ValueError:
        pass  # already registered by a previous test run in-process
    venv = make_vec_env("PointTest-v0", num_envs=4)
    state = venv.reset(jax.random.key(0))
    state, out = venv.step_jit(state, jnp.ones((4,), jnp.int32))
    assert out.reward.shape == (4,)

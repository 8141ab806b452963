"""Tutorial 10: training on your own environment.

Counterpart of reference ``docs/tutorials/10_train_custom_env.ipynb``. A
custom env here is a pure function pair (reset, step) over a pytree state —
thousands of instances then run lockstep inside one jitted program. This
defines a goal-reaching grid env, registers it, trains PPO on the true
reward, then BC from the PPO "expert". See docs/custom_envs.md for the
host-bridge and C++-engine variants. Run:
``python -m examples.tutorials.t10_train_custom_env``
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from imitation_tpu.algorithms.bc import BC
from imitation_tpu.data import rollout
from imitation_tpu.envs import make_vec_env, register
from imitation_tpu.envs.base import Env, Space, TimeStep
from imitation_tpu.models.policies import ActorCriticPolicy
from imitation_tpu.rl.ppo import PPO, PPOConfig

from examples.tutorials.t01_train_bc import eval_return


@struct.dataclass
class GridState:
    pos: jnp.ndarray  # (2,) float in [-1, 1]


class GoalGrid(Env):
    """Reach the corner (1, 1); reward = -distance, 40-step horizon."""

    max_episode_steps = 40

    @property
    def observation_space(self) -> Space:
        return Space.box(-1.0, 1.0, (2,))

    @property
    def action_space(self) -> Space:
        return Space.discrete(4)  # +x, -x, +y, -y

    def reset(self, key):
        pos = jax.random.uniform(key, (2,), minval=-1.0, maxval=0.0)
        return pos, GridState(pos=pos)

    def step(self, state, action, key):
        delta = jnp.array([[0.1, 0], [-0.1, 0], [0, 0.1], [0, -0.1]])[action]
        pos = jnp.clip(state.pos + delta, -1.0, 1.0)
        reward = -jnp.linalg.norm(pos - 1.0)
        f = jnp.zeros((), bool)
        return GridState(pos=pos), TimeStep(
            obs=pos, reward=reward, terminated=f, truncated=f
        )


def main(ppo_iters: int = 30):
    try:
        register("GoalGrid-v0", GoalGrid)
    except ValueError:
        pass  # already registered (repeat run in one process)
    venv = make_vec_env("GoalGrid-v0", num_envs=16)

    policy = ActorCriticPolicy(
        observation_space=venv.observation_space, action_space=venv.action_space
    )
    ppo = PPO(venv, policy, PPOConfig(n_steps=40, n_minibatches=4, n_epochs=4,
                                      learning_rate=1e-3))
    state = ppo.init_state(jax.random.key(0))
    for _ in range(ppo_iters):
        state, metrics = ppo._train_step_jit(state)
    expert_ret = eval_return(policy, state.variables, venv)
    print(f"PPO expert return on GoalGrid: {expert_ret:.2f}")

    demos = rollout.generate_trajectories(
        policy.sample_fn(), state.variables, venv,
        rollout.make_min_episodes(20), rng=0,
    )
    bc = BC(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
        demonstrations=demos,
        rng=0,
        batch_size=64,
    )
    bc.train(n_epochs=5)
    bc_ret = eval_return(bc.policy, bc.state.variables, venv)
    print(f"BC return from 20 demos: {bc_ret:.2f}")
    return expert_ret, bc_ret


if __name__ == "__main__":
    main()

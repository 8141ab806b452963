"""Tutorial 5a: preference comparisons with a CNN reward net on pixels.

Counterpart of reference
``docs/tutorials/5a_train_preference_comparisons_with_cnn.ipynb`` (Atari +
CnnRewardNet). Here the image env is a pure-JAX pixel rendering of CartPole
(cart position + pole angle drawn into a 16x16x1 frame) so everything stays
on-device, and the reward is learned by a ``CnnRewardNet`` from synthetic
preferences. Run: ``python -m examples.tutorials.t05a_preference_comparisons_cnn``
"""

import jax
import jax.numpy as jnp

from imitation_tpu.algorithms import preference_comparisons as pc
from imitation_tpu.envs import make_vec_env
from imitation_tpu.envs.base import Env, Space, TimeStep
from imitation_tpu.envs.classic import CartPole
from imitation_tpu.models.policies import ActorCriticPolicy
from imitation_tpu.rewards.reward_nets import CnnRewardNet
from imitation_tpu.rl.ppo import PPO, PPOConfig

SIZE = 16


class PixelCartPole(Env):
    """CartPole with observations rendered to a SIZE x SIZE x 1 image."""

    max_episode_steps = 200

    def __init__(self):
        self.inner = CartPole()

    @property
    def observation_space(self) -> Space:
        return Space.box(0.0, 1.0, (SIZE, SIZE, 1))

    @property
    def action_space(self) -> Space:
        return self.inner.action_space

    def _render(self, state_vec: jnp.ndarray) -> jnp.ndarray:
        x, _, theta, _ = state_vec
        img = jnp.zeros((SIZE, SIZE), jnp.float32)
        # cart: bright pixel row at the bottom, column ~ position
        col = jnp.clip(
            ((x / 2.4) * 0.5 + 0.5) * (SIZE - 1), 0, SIZE - 1
        ).astype(jnp.int32)
        img = img.at[SIZE - 1, col].set(1.0)
        # pole: column offset from cart ~ angle, drawn up the frame
        rows = jnp.arange(SIZE - 2, SIZE - 10, -1)
        offs = jnp.clip(
            col + ((theta / 0.21) * (jnp.arange(1, 9))).astype(jnp.int32),
            0, SIZE - 1,
        )
        img = img.at[rows, offs].set(1.0)
        return img[..., None]

    def reset(self, key):
        obs, state = self.inner.reset(key)
        return self._render(obs), state

    def step(self, state, action, key):
        new_state, ts = self.inner.step(state, action, key)
        return new_state, TimeStep(
            obs=self._render(ts.obs),
            reward=ts.reward,
            terminated=ts.terminated,
            truncated=ts.truncated,
        )


def main(total_timesteps: int = 6_000, total_comparisons: int = 60):
    from imitation_tpu.envs import register
    from imitation_tpu.envs.vector import VectorEnv

    venv = VectorEnv(PixelCartPole(), num_envs=8, max_episode_steps=100)
    reward_net = CnnRewardNet(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
        hid_channels=(8, 8),
        use_done=False,
    )
    policy = ActorCriticPolicy(  # MLP over flattened pixels
        observation_space=venv.observation_space,
        action_space=venv.action_space,
        hid_sizes=(64, 64),
    )
    ppo = PPO(venv, policy, PPOConfig(n_steps=32, n_minibatches=4, n_epochs=2))
    agent = pc.AgentTrainer(ppo, reward_net, venv, rng=0)

    trainer = pc.PreferenceComparisons(
        agent,
        reward_net,
        num_iterations=2,
        fragment_length=20,
        comparison_queue_size=200,
        initial_epoch_multiplier=2,
        allow_variable_horizon=True,  # CartPole terminates when the pole falls
        rng=0,
    )
    result = trainer.train(
        total_timesteps=total_timesteps, total_comparisons=total_comparisons
    )
    print(f"CNN reward loss {result['reward_loss']:.3f}, "
          f"accuracy {result['reward_accuracy']:.3f}")
    return result


if __name__ == "__main__":
    main(total_timesteps=30_000, total_comparisons=300)

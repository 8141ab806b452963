"""Example: reward learning from synthetic preferences (DRLHP/RLHF).

Counterpart of the reference's preference-comparisons tutorial notebook.
Run: python examples/rlhf_preference_comparisons.py
"""

import numpy as np

from imitation_tpu.algorithms import preference_comparisons as pc
from imitation_tpu.envs import make_vec_env
from imitation_tpu.models.policies import ActorCriticPolicy
from imitation_tpu.rewards.reward_nets import BasicRewardNet
from imitation_tpu.rl.ppo import PPO, PPOConfig


def main():
    venv = make_vec_env("Pendulum-v1", num_envs=8)
    reward_net = BasicRewardNet(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
    )
    policy = ActorCriticPolicy(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
    )
    ppo = PPO(venv, policy, PPOConfig(n_steps=64, n_minibatches=8, n_epochs=4))
    agent = pc.AgentTrainer(ppo, reward_net, venv, rng=0, exploration_frac=0.05)

    main_trainer = pc.PreferenceComparisons(
        agent,
        reward_net,
        num_iterations=5,
        fragment_length=25,
        comparison_queue_size=500,
        initial_epoch_multiplier=4,
        query_schedule="hyperbolic",
        rng=0,
    )
    result = main_trainer.train(total_timesteps=20_000, total_comparisons=200)
    print(f"final reward loss {result['reward_loss']:.3f}, "
          f"accuracy {result['reward_accuracy']:.3f}")


if __name__ == "__main__":
    main()

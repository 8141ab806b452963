"""Quickstart: train BC, GAIL and AIRL on CartPole demonstrations.

Counterpart of reference ``examples/quickstart.py``. Run:
    python examples/quickstart.py
"""

import numpy as np

from imitation_tpu.algorithms.adversarial.airl import AIRL
from imitation_tpu.algorithms.adversarial.gail import GAIL
from imitation_tpu.algorithms.bc import BC
from imitation_tpu.data import rollout
from imitation_tpu.envs import make_vec_env
from imitation_tpu.rl.ppo import PPOConfig
from imitation_tpu.testing import experts


def eval_policy(policy, variables, venv, n=10):
    trajs = rollout.generate_trajectories(
        policy.sample_fn(), variables, venv, rollout.make_min_episodes(n), rng=99
    )
    return float(np.mean([t.rews.sum() for t in trajs]))


def main():
    venv = make_vec_env("CartPole-v1", num_envs=8, max_episode_steps=200)
    print("Generating expert demonstrations...")
    demos = experts.generate_expert_trajectories("CartPole-v1", venv, min_episodes=20)
    print(f"  {len(demos)} episodes, mean return "
          f"{np.mean([t.rews.sum() for t in demos]):.1f}")

    print("\nTraining BC...")
    bc = BC(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
        demonstrations=demos,
        rng=0,
        batch_size=64,
    )
    bc.train(n_epochs=10)
    print(f"  BC return: {eval_policy(bc.policy, bc.state.variables, venv):.1f}")

    print("\nTraining GAIL (fused loop)...")
    gail = GAIL(
        demonstrations=demos,
        demo_batch_size=256,
        venv=venv,
        gen_config=PPOConfig(n_steps=128, n_minibatches=8, n_epochs=5,
                             learning_rate=1e-3, ent_coef=0.01),
        allow_variable_horizon=True,
        seed=0,
    )
    gail.train_fused(total_timesteps=30 * gail.gen_train_timesteps)
    print(f"  GAIL return: {eval_policy(gail.policy, gail.policy_variables, venv):.1f}")

    print("\nTraining AIRL...")
    airl = AIRL(
        demonstrations=demos,
        demo_batch_size=256,
        venv=venv,
        gen_config=PPOConfig(n_steps=128, n_minibatches=8, n_epochs=5,
                             learning_rate=1e-3, ent_coef=0.01),
        allow_variable_horizon=True,
        seed=0,
    )
    airl.train(total_timesteps=10 * airl.gen_train_timesteps)
    print(f"  AIRL return: {eval_policy(airl.policy, airl.policy_variables, venv):.1f}")


if __name__ == "__main__":
    main()

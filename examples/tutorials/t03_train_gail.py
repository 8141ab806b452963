"""Tutorial 3: GAIL on CartPole.

Counterpart of reference ``docs/tutorials/3_train_gail.ipynb``: adversarial
imitation — the discriminator learns to tell expert from generator
transitions, the PPO generator trains on -log sigma(-D) rewards.
Run: ``python -m examples.tutorials.t03_train_gail``
"""

import numpy as np

from imitation_tpu.algorithms.adversarial.gail import GAIL
from imitation_tpu.envs import make_vec_env
from imitation_tpu.rl.ppo import PPOConfig
from imitation_tpu.testing import experts

from examples.tutorials.t01_train_bc import eval_return


def main(total_timesteps: int = 20_000):
    venv = make_vec_env("CartPole-v1", num_envs=8, max_episode_steps=200)
    demos = experts.generate_expert_trajectories("CartPole-v1", venv, min_episodes=20)

    gail = GAIL(
        demonstrations=demos,
        demo_batch_size=256,
        venv=venv,
        gen_config=PPOConfig(
            n_steps=128, n_minibatches=8, n_epochs=5,
            learning_rate=1e-3, ent_coef=0.01,
        ),
        allow_variable_horizon=True,
        seed=0,
    )
    gail.train(total_timesteps)
    after = eval_return(gail.policy, gail.policy_variables, venv)
    print(f"GAIL return: {after:.1f} "
          f"(expert {np.mean([t.rews.sum() for t in demos]):.1f})")
    return after


if __name__ == "__main__":
    main(total_timesteps=100_000)

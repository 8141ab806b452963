"""Tutorial 4: AIRL on CartPole.

Counterpart of reference ``docs/tutorials/4_train_airl.ipynb``: like GAIL,
but the discriminator logit is r_theta(s,a,s') - log pi(a|s), so the learned
reward transfers — ``reward_test`` strips the potential shaping term.
Run: ``python -m examples.tutorials.t04_train_airl``
"""

import numpy as np

from imitation_tpu.algorithms.adversarial.airl import AIRL
from imitation_tpu.envs import make_vec_env
from imitation_tpu.rl.ppo import PPOConfig
from imitation_tpu.testing import experts

from examples.tutorials.t01_train_bc import eval_return


def main(total_timesteps: int = 20_000):
    venv = make_vec_env("CartPole-v1", num_envs=8, max_episode_steps=200)
    demos = experts.generate_expert_trajectories("CartPole-v1", venv, min_episodes=20)

    airl = AIRL(
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
    airl.train(total_timesteps)
    after = eval_return(airl.policy, airl.policy_variables, venv)

    # The transferable (unshaped) reward: reward_test_fn on an expert episode.
    t = demos[0]
    r = airl.reward_test_fn()(
        airl.disc_state.variables,
        np.asarray(t.obs[:-1], np.float32), np.asarray(t.acts),
        np.asarray(t.obs[1:], np.float32), np.zeros(len(t), np.float32),
    )
    print(f"AIRL return: {after:.1f} "
          f"(expert {np.mean([tr.rews.sum() for tr in demos]):.1f}); "
          f"learned reward on an expert episode: mean {np.mean(r):.3f}")
    return after


if __name__ == "__main__":
    main(total_timesteps=100_000)

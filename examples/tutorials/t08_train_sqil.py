"""Tutorial 8: SQIL on CartPole.

Counterpart of reference ``docs/tutorials/8_train_sqil.ipynb``: soft
Q-learning imitation — a DQN whose replay always samples 50% expert
transitions with reward 1 and 50% fresh env transitions with reward 0.
Run: ``python -m examples.tutorials.t08_train_sqil``
"""

from imitation_tpu.algorithms.sqil import SQIL
from imitation_tpu.envs import make_vec_env
from imitation_tpu.rl.dqn import DQNConfig
from imitation_tpu.testing import experts

from examples.tutorials.t01_train_bc import eval_return


def main(total_timesteps: int = 3_000):
    venv = make_vec_env("CartPole-v1", num_envs=8, max_episode_steps=200)
    demos = experts.generate_expert_trajectories("CartPole-v1", venv, min_episodes=20)

    sqil = SQIL(
        venv=venv,
        demonstrations=demos,
        dqn_config=DQNConfig(learning_starts=64, train_freq=4, batch_size=64),
        allow_variable_horizon=True,
        seed=0,
    )
    sqil.train(total_timesteps=total_timesteps)
    ret = eval_return(sqil.policy, sqil.policy_variables, venv)
    print(f"SQIL return after {total_timesteps} steps: {ret:.1f}")
    return ret


if __name__ == "__main__":
    main(total_timesteps=50_000)

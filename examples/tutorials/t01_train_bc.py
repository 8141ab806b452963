"""Tutorial 1: Behavioral Cloning on CartPole.

Counterpart of reference ``docs/tutorials/1_train_bc.ipynb``: collect expert
demonstrations, evaluate the untrained policy, train BC on the (obs, act)
pairs, and evaluate again. Run: ``python -m examples.tutorials.t01_train_bc``
"""

import numpy as np

from imitation_tpu.algorithms.bc import BC
from imitation_tpu.data import rollout
from imitation_tpu.envs import make_vec_env
from imitation_tpu.testing import experts


def eval_return(policy, variables, venv, n=10, seed=99):
    trajs = rollout.generate_trajectories(
        policy.sample_fn(), variables, venv, rollout.make_min_episodes(n), rng=seed
    )
    return float(np.mean([t.rews.sum() for t in trajs]))


def main(n_epochs: int = 4, n_demos: int = 20):
    venv = make_vec_env("CartPole-v1", num_envs=8, max_episode_steps=200)
    demos = experts.generate_expert_trajectories(
        "CartPole-v1", venv, min_episodes=n_demos
    )
    print(f"demos: {len(demos)} episodes, "
          f"mean return {np.mean([t.rews.sum() for t in demos]):.1f}")

    bc = BC(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
        demonstrations=demos,
        rng=0,
        batch_size=64,
    )
    before = eval_return(bc.policy, bc.state.variables, venv)
    print(f"return before BC: {before:.1f}")
    bc.train(n_epochs=n_epochs)
    after = eval_return(bc.policy, bc.state.variables, venv)
    print(f"return after BC: {after:.1f}")
    return before, after


if __name__ == "__main__":
    main(n_epochs=10)

"""Tutorial 6: Maximum Causal Entropy IRL on a tabular MDP.

Counterpart of reference ``docs/tutorials/6_train_mce.ipynb``: soft value
iteration (``mce_partition_fh``), occupancy measures, then MCE IRL gradient
descent until the learned reward's occupancy matches the expert's.
Run: ``python -m examples.tutorials.t06_train_mce``
"""

import jax.numpy as jnp
import numpy as np

from imitation_tpu.algorithms.mce_irl import (
    MCEIRL,
    mce_occupancy_measures,
    mce_partition_fh,
)
from imitation_tpu.envs.tabular import random_mdp


def main(n_states: int = 6, n_actions: int = 3, horizon: int = 8):
    env = random_mdp(n_states, n_actions, horizon=horizon, seed=0)

    # Expert: the soft-optimal policy under the TRUE reward.
    _, _, pi_expert = mce_partition_fh(env)
    _, D_expert = mce_occupancy_measures(env, pi=pi_expert)
    print("expert state occupancy:", np.round(np.asarray(D_expert), 3))

    irl = MCEIRL(
        np.asarray(D_expert, np.float64), env,
        log_interval=None, optimizer_kwargs=dict(lr=0.05),
    )
    irl.train(max_iter=400)

    _, _, pi_learned = mce_partition_fh(
        env,
        reward=jnp.asarray(
            irl.reward_net.apply(irl.variables, jnp.asarray(env.observation_matrix))
        ),
    )
    _, D_learned = mce_occupancy_measures(env, pi=pi_learned)
    gap = float(np.abs(np.asarray(D_learned) - np.asarray(D_expert)).max())
    print("learned state occupancy:", np.round(np.asarray(D_learned), 3))
    print(f"max occupancy gap: {gap:.4f}")
    return gap


if __name__ == "__main__":
    main()

"""Measured evidence rows for SQIL, MCE IRL and Density (VERDICT r2 #10).

Each algorithm gets one real (non-test-budget) run with a recorded number in
``output/parity/results.json``, so every algorithm family has a measured
result, not just a statistical test gate:

* ``sqil/cartpole`` — SQIL (DQN variant) on device CartPole; return of the
  greedy policy after training (expert = 500).
* ``density/pendulum`` — KDE state-action reward + PPO on device Pendulum;
  true-reward return (random ~ -1200, expert ~ -150..-250).
* ``mceirl/random_mdp`` — MCE IRL to convergence on a random tabular MDP;
  records the learned policy's TRUE-reward expected return alongside the
  expert's, plus the occupancy-measure gap the algorithm optimizes.

Runs on the CPU backend by default (tiny nets; classic-control device envs)
so it can fill in while the chip is busy. Usage:
    python -m benchmarking.run_small_algos [sqil|density|mceirl ...]
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def _record(key: str, final: float, seed: int, t0: float, extra=None) -> None:
    from benchmarking.run_parity import record

    algo, env_key = key.split("/", 1)
    record(algo, env_key, seed, final, {"wall_s": time.time() - t0, **(extra or {})})
    print(f"{key}: {final:.1f} ({time.time() - t0:.0f}s)")


def run_sqil(seed: int = 0) -> None:
    from imitation_tpu.algorithms.sqil import SQIL
    from imitation_tpu.data import rollout
    from imitation_tpu.envs import make_vec_env
    from imitation_tpu.rl.dqn import DQNConfig
    from imitation_tpu.testing import experts

    t0 = time.time()
    venv = make_vec_env("CartPole-v1", num_envs=8)
    demos = experts.generate_expert_trajectories(
        "CartPole-v1", venv, min_episodes=10, seed=seed
    )
    sqil = SQIL(
        venv=venv,
        demonstrations=demos,
        dqn_config=DQNConfig(
            learning_starts=500,
            train_freq=4,
            batch_size=64,
            gradient_steps=4,
            # 3e-4/tui=500 diverges on some seeds late in training (seed 2
            # collapsed to 9.3 at 300k steps); 1e-4 with a slower target
            # copy is stable at 500.0 across the previously-failing seeds.
            learning_rate=1e-4,
            target_update_interval=2000,
            exploration_fraction=0.3,
            exploration_final_eps=0.05,
        ),
        allow_variable_horizon=True,
        seed=seed,
    )
    sqil.train(total_timesteps=300_000)
    trajs = rollout.generate_trajectories(
        sqil.policy.sample_fn(), sqil.state.variables, venv,
        rollout.make_min_episodes(50), rng=seed + 1,
    )
    _record("sqil/cartpole", float(np.mean([t.rews.sum() for t in trajs])), seed, t0)


def run_density(seed: int = 0) -> None:
    from imitation_tpu.algorithms.density import DensityAlgorithm
    from imitation_tpu.envs import make_vec_env
    from imitation_tpu.rl.ppo import PPOConfig
    from imitation_tpu.testing import experts

    t0 = time.time()
    venv = make_vec_env("Pendulum-v1", num_envs=16)
    demos = experts.generate_expert_trajectories(
        "Pendulum-v1", venv, min_episodes=20, seed=seed
    )
    algo = DensityAlgorithm(
        demonstrations=demos,
        venv=venv,
        rl_config=PPOConfig(
            n_steps=64, n_minibatches=8, n_epochs=10,
            learning_rate=3e-4, gamma=0.95, gae_lambda=0.95,
        ),
        seed=seed,
    )
    algo.train()
    # 500k PPO steps: the density reward is fixed after fitting, so RL
    # budget is the lever (200k left Pendulum at ~-718; 500k reaches ~-441,
    # the round-3 tuned evidence row).
    algo.train_policy(n_timesteps=500_000)
    stats = algo.test_policy(n_trajectories=50, true_reward=True)
    _record("density/pendulum", float(stats["return_mean"]), seed, t0)


def run_mceirl(seed: int = 0) -> None:
    from imitation_tpu.algorithms.mce_irl import (
        MCEIRL,
        mce_occupancy_measures,
        mce_partition_fh,
    )
    from imitation_tpu.envs.tabular import random_mdp

    t0 = time.time()
    env = random_mdp(16, 4, horizon=16, seed=seed)
    _, _, pi_expert = mce_partition_fh(env)
    _, D_demo = mce_occupancy_measures(env, pi=pi_expert)
    trainer = MCEIRL(D_demo, env, linf_eps=1e-4)
    trainer.train(max_iter=2000)
    import jax.numpy as jnp

    _, D_learned = mce_occupancy_measures(env, pi=jnp.asarray(trainer.policy.pi))
    om_gap = float(np.abs(np.asarray(D_learned) - np.asarray(D_demo)).max())

    def expected_return(pi) -> float:
        """Exact expected TRUE-reward return of a time-dependent policy."""
        d = np.asarray(env.initial_state_dist, np.float64)
        total = 0.0
        T = np.asarray(env.transition_matrix, np.float64)  # [S, A, S']
        R = np.asarray(env.reward_matrix, np.float64)  # [S]
        pi = np.asarray(pi, np.float64)  # [T, S, A]
        for t in range(env.horizon):
            total += float(d @ R)
            sa = d[:, None] * pi[t]  # [S, A]
            d = np.einsum("sa,sap->p", sa, T)
        return total

    ret_learned = expected_return(trainer.policy.pi)
    ret_expert = expected_return(pi_expert)
    _record(
        "mceirl/random_mdp", ret_learned, seed, t0,
        extra={"expert_return": ret_expert, "om_linf_gap": om_gap},
    )


RUNNERS = {"sqil": run_sqil, "density": run_density, "mceirl": run_mceirl}


def main() -> None:
    argv = sys.argv[1:]
    seed = 0
    if "--seed" in argv:
        i = argv.index("--seed")
        seed = int(argv[i + 1])
        del argv[i : i + 2]
    which = argv or list(RUNNERS)
    for name in which:
        RUNNERS[name](seed=seed)


if __name__ == "__main__":
    main()

"""RLHF (preference comparisons) long-run benchmark on Pendulum.

The reference publishes no RLHF benchmark number in-repo, so the bar is
self-consistency (VERDICT round-1, item 7): a real learning curve with wall
time — final agent return should approach expert-level Pendulum performance
(random ~ -1200, converged PPO on true reward ~ -200).

Writes {"curve": [...], "final_return": ..., "wall_s": ...} to
output/r2/rlhf_pendulum.json and appends to output/parity/results.json under
"rlhf/pendulum". Run ALONE on the chip.

Usage: python -m benchmarking.run_rlhf [--timesteps N] [--comparisons K]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--timesteps", type=int, default=400_000)
    ap.add_argument("--comparisons", type=int, default=600)
    ap.add_argument("--iterations", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    import imitation_tpu

    imitation_tpu.enable_compile_cache()
    from imitation_tpu.algorithms import preference_comparisons as pc
    from imitation_tpu.data import rollout as rmod
    from imitation_tpu.envs import make_vec_env
    from imitation_tpu.models.policies import ActorCriticPolicy
    from imitation_tpu.rewards.reward_nets import BasicRewardNet
    from imitation_tpu.rl.ppo import PPO, PPOConfig

    venv = make_vec_env("Pendulum-v1", num_envs=32)
    policy = ActorCriticPolicy(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
        hid_sizes=(64, 64),
    )
    ppo = PPO(
        venv,
        policy,
        PPOConfig(
            n_steps=64, n_minibatches=8, n_epochs=10,
            learning_rate=3e-4, ent_coef=0.0, gamma=0.95, gae_lambda=0.95,
        ),
        seed=args.seed,
    )
    reward_net = BasicRewardNet(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
        normalize_input=True,
    )
    agent_trainer = pc.AgentTrainer(
        ppo, reward_net, venv, rng=args.seed, exploration_frac=0.05
    )
    trainer = pc.PreferenceComparisons(
        agent_trainer,
        reward_net,
        num_iterations=args.iterations,
        fragmenter=pc.RandomFragmenter(rng=args.seed, warning_threshold=0),
        preference_gatherer=pc.SyntheticGatherer(rng=np.random.default_rng(args.seed)),
        fragment_length=50,
        transition_oversampling=1.5,
        initial_comparison_frac=0.1,
        initial_epoch_multiplier=4.0,
        allow_variable_horizon=True,
        rng=args.seed,
        seed=args.seed,
    )

    curve = []
    t0 = time.time()

    def true_return(n=10):
        trajs = rmod.generate_trajectories(
            policy.sample_fn(), agent_trainer.state.variables, venv,
            rmod.make_min_episodes(n), rng=args.seed + 99,
        )
        return float(np.mean([t.rews.sum() for t in trajs]))

    def callback(iteration):
        ret = true_return()
        curve.append({
            "iteration": iteration,
            "true_return10": ret,
            "wall_s": time.time() - t0,
        })
        print(f"[rlhf] iter {iteration}: true_return={ret:.1f} "
              f"({curve[-1]['wall_s']:.0f}s)", flush=True)
        os.makedirs("output/r2", exist_ok=True)
        with open("output/r2/rlhf_pendulum.json", "w") as f:
            json.dump({"curve": curve}, f, indent=1)

    result = trainer.train(args.timesteps, args.comparisons, callback=callback)
    final = true_return(n=50)
    wall = time.time() - t0
    out = {
        "curve": curve,
        "final_return50": final,
        "wall_s": wall,
        "reward_loss": result.get("reward_loss"),
        "reward_accuracy": result.get("reward_accuracy"),
        "timesteps": args.timesteps,
        "comparisons": args.comparisons,
    }
    with open("output/r2/rlhf_pendulum.json", "w") as f:
        json.dump(out, f, indent=1)
    # Also record in the parity results file for the summary table.
    res_path = os.path.join("output", "parity", "results.json")
    results = {}
    if os.path.exists(res_path):
        with open(res_path) as f:
            results = json.load(f)
    results.setdefault("rlhf/pendulum", []).append(
        {"return": final, "seed": args.seed, "ts": time.time(), "wall_s": wall}
    )
    with open(res_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"rlhf/pendulum: final_return50={final:.1f} ({wall:.0f}s)")


if __name__ == "__main__":
    main()

"""Micro-benchmark: per-round async dispatch vs the fused scanned program.

Round-1 measured the scanned multi-round `train_fused` program SLOWER than
async per-round dispatch (71k vs 300k steps/s) — suspected scan-carry copies
of the replay buffer. Round 2 added carry donation and made the demo batch a
jit argument. This script measures both paths at the bench.py configuration
and prints one JSON line per path; run it ALONE on the chip.

Usage: python -m benchmarking.bench_fused [--rounds N] [--rps K]
"""

from __future__ import annotations

import argparse
import json
import time


def force(jax, tr):
    """Fetch-based barrier (block_until_ready can return early on the
    some remote/tunneled TPU platforms; a device->host value fetch cannot)."""
    g = sum(x.sum() for x in jax.tree.leaves(tr.gen_state.variables))
    d = sum(x.sum() for x in jax.tree.leaves(tr.disc_state.variables))
    return float(g) + float(d)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=16)
    ap.add_argument("--rps", type=int, default=8, help="rounds per fused sync")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/imitation_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from imitation_tpu.algorithms.adversarial.gail import GAIL
    from imitation_tpu.envs import make_vec_env
    from imitation_tpu.rl.ppo import PPOConfig
    from imitation_tpu.testing import experts

    num_envs, n_steps = 1024, 128
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        demo_venv = make_vec_env("CartPole-v1", num_envs=64, max_episode_steps=100)
        demos = experts.generate_expert_trajectories(
            "CartPole-v1", demo_venv, min_episodes=64, seed=0
        )

    def make_trainer():
        venv = make_vec_env("CartPole-v1", num_envs=num_envs, max_episode_steps=500)
        return GAIL(
            demonstrations=demos,
            demo_batch_size=2048,
            venv=venv,
            gen_config=PPOConfig(n_steps=n_steps, n_minibatches=32, n_epochs=5),
            n_disc_updates_per_round=2,
            allow_variable_horizon=True,
            seed=0,
        )

    results = {}

    # --- per-round async path ---------------------------------------------
    tr = make_trainer()

    def one_round():
        tr.train_gen(sync=False)
        for _ in range(tr.n_disc_updates_per_round):
            tr.train_disc(sync=False)

    print("compiling per-round path...", flush=True)
    t0 = time.perf_counter()
    one_round()
    force(jax, tr)
    print(f"per-round compile+first {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(args.rounds):
        one_round()
    force(jax, tr)
    el = time.perf_counter() - t0
    results["per_round"] = args.rounds * n_steps * num_envs / el
    print(json.dumps({"path": "per_round", "steps_per_s": round(results["per_round"], 1)}), flush=True)

    # --- fused scanned path -----------------------------------------------
    tr2 = make_trainer()
    print("compiling fused path...", flush=True)
    t0 = time.perf_counter()
    tr2.train_fused(args.rps * tr2.gen_train_timesteps, rounds_per_sync=args.rps)  # warmup+compile
    force(jax, tr2)
    print(f"fused compile+first {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    tr2.train_fused(args.rounds * tr2.gen_train_timesteps, rounds_per_sync=args.rps)
    force(jax, tr2)
    el = time.perf_counter() - t0
    results["fused"] = args.rounds * n_steps * num_envs / el

    for k, v in results.items():
        print(json.dumps({"path": k, "steps_per_s": round(v, 1)}), flush=True)


if __name__ == "__main__":
    main()

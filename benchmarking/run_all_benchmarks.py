"""Run the full benchmark matrix: algorithms x envs x seeds.

Counterpart of reference ``benchmarking/run_all_benchmarks.sh`` (+ SLURM
variants): {bc, dagger, sqil, gail, airl} x registered benchmark envs x N
seeds, via the parallel sweep runner. The reference matrix is 4 algos x 5
seals MuJoCo envs x 10 seeds (benchmarking/README.md:3-6); here the env list
defaults to the pure-JAX fixed-horizon envs (MuJoCo via the gym bridge when
available).

Usage:
    python benchmarking/run_all_benchmarks.py --seeds 0 1 2 \
        --envs seals/CartPole-v0 Pendulum-v1 --fast
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imitation_tpu.scripts.parallel import parallel_sweep  # noqa: E402

ALGO_SPECS = {
    "bc": ("train_imitation", "bc"),
    "dagger": ("train_imitation", "dagger"),
    "sqil": ("train_imitation", "sqil"),
    "gail": ("train_adversarial", "gail"),
    "airl": ("train_adversarial", "airl"),
}

DEFAULT_ENVS = ["seals/CartPole-v0", "Pendulum-v1", "seals/MountainCar-v0"]


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--algos", nargs="*", default=list(ALGO_SPECS))
    p.add_argument("--envs", nargs="*", default=DEFAULT_ENVS)
    p.add_argument("--seeds", type=int, nargs="*", default=list(range(10)))
    p.add_argument("--fast", action="store_true", help="tiny debug configs")
    p.add_argument("--run-root", default="output/benchmark")
    p.add_argument("--workers", type=int, default=1)
    args = p.parse_args()

    all_results = {}
    for algo in args.algos:
        experiment, command = ALGO_SPECS[algo]
        for env in args.envs:
            named = ["fast"] if args.fast else []
            results = parallel_sweep(
                experiment,
                command=command,
                named_configs=named,
                base_config_updates={"env_name": env},
                seeds=args.seeds,
                run_root=os.path.join(
                    args.run_root, algo, env.replace("/", "_")
                ),
                n_workers=args.workers,
            )
            all_results[f"{algo}/{env}"] = results
    out_path = os.path.join(args.run_root, "all_results.json")
    os.makedirs(args.run_root, exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(all_results, f, indent=2, default=str)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()

"""One-command benchmark-matrix driver.

Regenerates the full parity matrix from a clean checkout: trains any
missing experts, runs every requested {algo} x {env} x {seed} cell through
``benchmarking.run_parity`` (and optionally the RLHF cells through
``benchmarking.run_rlhf``), then prints the provenance-annotated summary
table. Counterpart of the reference's benchmark drivers
(reference experiments/imit_benchmark.sh, bc_benchmark.sh,
dagger_benchmark.sh and benchmarking/run_all_benchmarks.sh) as ONE
resumable command instead of a family of shell scripts.

Resumable by design: cells whose target seed count is already satisfied by
complete rows in the results file are skipped, so the same command tops up
a partially-filled matrix (pass ``--force`` to re-run regardless).

Each cell runs as a subprocess so the runners' SIGTERM/partial-row
semantics hold, one at a time (single benchmark host/chip).

Usage:
  python -m benchmarking.run_matrix                      # full matrix
  python -m benchmarking.run_matrix --algos gail airl --envs seals_swimmer
  python -m benchmarking.run_matrix --seeds 3 --rlhf
  python -m benchmarking.run_matrix --fast --algos bc --envs seals_swimmer
  python -m benchmarking.run_matrix --dry-run            # plan only
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ALGOS = ["bc", "dagger", "gail", "airl"]
ENVS = [
    "seals_ant",
    "seals_half_cheetah",
    "seals_hopper",
    "seals_swimmer",
    "seals_walker2d",
]

# --fast smoke budgets (reference tests/test_experiments.py:12-20 runs the
# shell drivers with TIMESTEPS=4096-style tiny budgets): enough to execute
# every phase end-to-end, nowhere near enough to learn.
FAST_EXPERT_TIMESTEPS = 8192
FAST_CELL_BUDGET = {"bc": 64, "dagger": 6000, "gail": 16384, "airl": 16384}
FAST_EVAL_EPISODES = 3


def completed_seeds(results_path: str, algo: str, env: str) -> set:
    """Seeds with a COMPLETE (non-partial) row in the results file."""
    if not os.path.exists(results_path):
        return set()
    try:
        with open(results_path) as f:
            results = json.load(f)
    except (json.JSONDecodeError, OSError):
        return set()
    return {
        r.get("seed", 0)
        for r in results.get(f"{algo}/{env}", [])
        if not r.get("partial")
    }


def expert_ready(experts_dir: str, env: str) -> bool:
    d = os.path.join(experts_dir, env)
    return os.path.isdir(os.path.join(d, "policy")) and os.path.isdir(
        os.path.join(d, "rollouts")
    )


def main() -> None:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--algos", nargs="+", default=ALGOS, choices=ALGOS)
    ap.add_argument("--envs", nargs="+", default=ENVS, choices=ENVS)
    ap.add_argument("--seeds", type=int, default=3,
                    help="target completed seeds per cell (reference "
                         "protocol: 10; benchmarking/README.md:3-6)")
    ap.add_argument("--rlhf", action="store_true",
                    help="also run the RLHF (preference comparisons) cells")
    ap.add_argument("--fast", action="store_true",
                    help="tiny smoke budgets for every phase (CI)")
    ap.add_argument("--force", action="store_true",
                    help="run cells even if their seed target is met")
    ap.add_argument("--dry-run", action="store_true",
                    help="print the plan without running anything")
    ap.add_argument("--experts-dir", default=None,
                    help="expert/demo dir (default: $PARITY_EXPERTS_DIR or "
                         "output/experts)")
    ap.add_argument("--results", default=None,
                    help="results file (default: $PARITY_RESULTS_PATH or "
                         "output/parity/results.json)")
    ap.add_argument("--timeout", type=int, default=None,
                    help="per-cell timeout in seconds (SIGTERM -> the "
                         "runner records a partial row)")
    ap.add_argument("--backend", choices=["device", "cpu"], default="device",
                    help="'cpu' forces the JAX CPU backend in every child")
    args = ap.parse_args()

    experts_dir = (
        args.experts_dir
        or os.environ.get("PARITY_EXPERTS_DIR")
        or os.path.join("output", "experts")
    )
    results_path = (
        args.results
        or os.environ.get("PARITY_RESULTS_PATH")
        or os.path.join("output", "parity", "results.json")
    )
    child_env = dict(
        os.environ,
        PARITY_EXPERTS_DIR=experts_dir,
        PARITY_RESULTS_PATH=results_path,
    )

    def run(cmd, label):
        print(f"[matrix] {time.strftime('%H:%M:%S')} start {label}", flush=True)
        if args.dry_run:
            print(f"[matrix]   would run: {' '.join(cmd)}")
            return 0
        full = cmd
        if args.timeout:
            full = ["timeout", str(args.timeout)] + cmd
        rc = subprocess.call(full, env=child_env)
        print(f"[matrix] {time.strftime('%H:%M:%S')} done  {label} rc={rc}",
              flush=True)
        return rc

    # Phase 1: experts (skipped per-env when policy+rollouts already exist).
    for env in args.envs:
        if expert_ready(experts_dir, env):
            print(f"[matrix] expert {env}: ready in {experts_dir}")
            continue
        cmd = [sys.executable, "-m", "benchmarking.train_experts", env,
               "--out-root", experts_dir]
        if args.fast:
            cmd += ["--extra-timesteps", str(FAST_EXPERT_TIMESTEPS)]
        if args.backend == "cpu":
            cmd += ["--backend", "cpu"]
        run(cmd, f"expert {env}")

    # Phase 2: imitation/adversarial cells, serial (one chip / one host).
    for algo in args.algos:
        for env in args.envs:
            done = completed_seeds(results_path, algo, env)
            for seed in range(args.seeds):
                if seed in done and not args.force:
                    print(f"[matrix] {algo}/{env} s{seed}: already complete")
                    continue
                cmd = [sys.executable, "-m", "benchmarking.run_parity",
                       algo, env, "--seed", str(seed)]
                if args.fast:
                    cmd += ["--total-timesteps", str(FAST_CELL_BUDGET[algo]),
                            "--eval-episodes", str(FAST_EVAL_EPISODES)]
                if args.backend == "cpu":
                    cmd += ["--backend", "cpu"]
                run(cmd, f"{algo}/{env} s{seed}")

    # Phase 3 (optional): RLHF cells + their true-reward PPO gates.
    if args.rlhf:
        rlhf_envs = [e for e in ("seals_half_cheetah",) if e in args.envs]
        for env in rlhf_envs:
            for seed in range(args.seeds):
                for extra, key in ((["--true-baseline"], "rlhf_true_ppo"),
                                   ([], "rlhf")):
                    if seed in completed_seeds(results_path, key, env) \
                            and not args.force:
                        print(f"[matrix] {key}/{env} s{seed}: already complete")
                        continue
                    cmd = [sys.executable, "-m", "benchmarking.run_rlhf",
                           "--env", env, "--seed", str(seed)] + extra
                    if args.fast:
                        cmd += ["--timesteps", "8192", "--comparisons", "20",
                                "--iterations", "2"]
                    if args.backend == "cpu":
                        cmd += ["--backend", "cpu"]
                    run(cmd, f"{key}/{env} s{seed}")

    # Phase 4: summary.
    if args.dry_run:
        return
    from benchmarking.summarize import parity_markdown

    print()
    print(parity_markdown(results_path=results_path,
                          experts_path=os.path.join(experts_dir,
                                                    "summary.json")))


if __name__ == "__main__":
    main()

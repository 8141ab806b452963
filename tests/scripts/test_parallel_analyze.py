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


# ---------------------------------------------------------------------------
# Deeper CLI/integration coverage (VERDICT r2 #6; reference
# tests/scripts/test_scripts.py:674,859-975 analogues)
# ---------------------------------------------------------------------------


def test_tuning_two_phase_end_to_end(tmp_path):
    """tune() phase-1 sweep over a grid + phase-2 re-eval of the best config
    on fresh seeds (reference tuning.py:18-76 + test_scripts.py tuning)."""
    from imitation_tpu.scripts.tuning import tune

    summary = tune(
        "eval_policy",
        named_configs=["fast"],
        search_space={"max_episode_steps": {"grid": [5, 20]}},
        tune_seeds=[0, 1],
        eval_seeds=[100, 101],
        run_root=str(tmp_path),
    )
    # CartPole return == episode length, so the longer-horizon config wins.
    assert summary["best_overrides"] == {"max_episode_steps": 20}
    assert len(summary["eval_returns"]) == 2
    assert summary["eval_mean_return"] > 5
    assert (tmp_path / "tuning_summary.json").exists()
    # phase-2 runs really re-ran the best config on the eval seeds
    assert (tmp_path / "phase2_eval" / "sweep_results.json").exists()


def _write_fake_run(root, name, env, seed, status, ret):
    d = root / name
    d.mkdir(parents=True)
    (d / "config.json").write_text(json.dumps({"env_name": env, "seed": seed}))
    (d / "run.json").write_text(json.dumps({
        "status": status,
        "experiment": {"name": "bc"},
        "result": {"imit_stats": {"monitor_return_mean": ret, "return_std": 1.0,
                                  "n_traj": 5}},
    }))
    return d


def test_analyze_verbosity_levels_and_csv(tmp_path):
    _write_fake_run(tmp_path, "r1", "CartPole-v1", 0, "COMPLETED", 100.0)
    _write_fake_run(tmp_path, "r2", "CartPole-v1", 1, "COMPLETED", 120.0)
    df1 = analyze_imitation([str(tmp_path)], verbosity_level=1)
    assert set(df1.columns) == {
        "status", "exp_name", "env_name", "seed", "imit_return_mean",
    }
    csv = tmp_path / "out.csv"
    df2 = analyze_imitation(
        [str(tmp_path)], verbosity_level=2, csv_output_path=str(csv)
    )
    for col in ("dir", "imit_return_std", "n_traj"):
        assert col in df2.columns
    assert csv.exists()
    import pandas as pd

    loaded = pd.read_csv(csv)
    assert len(loaded) == 2
    assert sorted(loaded["imit_return_mean"]) == [100.0, 120.0]


def test_analyze_env_filter_and_skip_failed(tmp_path):
    _write_fake_run(tmp_path, "ok", "CartPole-v1", 0, "COMPLETED", 10.0)
    _write_fake_run(tmp_path, "fail", "CartPole-v1", 1, "FAILED", None)
    _write_fake_run(tmp_path, "other", "Pendulum-v1", 0, "COMPLETED", -300.0)
    assert len(analyze_imitation([str(tmp_path)])) == 3
    assert len(analyze_imitation([str(tmp_path)], skip_failed_runs=True)) == 2
    df = analyze_imitation([str(tmp_path)], env_name="Pendulum-v1")
    assert len(df) == 1 and df.iloc[0]["imit_return_mean"] == -300.0


def test_analyze_empty_and_corrupt_dirs(tmp_path):
    (tmp_path / "junk").mkdir()
    (tmp_path / "junk" / "config.json").write_text("{not json")
    (tmp_path / "junk" / "run.json").write_text("{}")
    df = analyze_imitation([str(tmp_path)])
    assert df.empty


def test_gather_tb_directories(tmp_path):
    d = _write_fake_run(tmp_path, "r1", "CartPole-v1", 0, "COMPLETED", 1.0)
    tb = d / "tb"
    tb.mkdir()
    (tb / "events.out.tfevents.123.host").write_text("")
    out = gather_tb_directories([str(tmp_path)], tb_output_dir=str(tmp_path / "g"))
    assert out["n_tb_dirs"] == 1
    assert os.path.isdir(os.path.join(out["gather_dir"], "run_0000"))


def test_parallel_sweep_search_space_multi_seed(tmp_path):
    """Grid x seeds sweep through a real experiment (the reference's
    test_parallel shape, test_scripts.py:859-975)."""
    results = parallel_sweep(
        "eval_policy",
        named_configs=["fast"],
        search_space={"max_episode_steps": {"grid": [5, 10]}},
        seeds=[0, 1],
        run_root=str(tmp_path),
    )
    assert len(results) == 4
    assert all(r["status"] == "COMPLETED" for r in results)
    by_steps = {}
    for r in results:
        by_steps.setdefault(r["overrides"]["max_episode_steps"], []).append(
            r["result"]["monitor_return_mean"]
        )
    # longer horizon -> strictly larger CartPole return for every seed
    assert min(by_steps[10]) > max(by_steps[5]) - 1e-9


def test_eval_policy_bad_policy_path_raises(tmp_path):
    from imitation_tpu.scripts import eval_policy as ep

    with pytest.raises(Exception):
        ep.ex.run_cli([
            "with", "fast",
            "expert.policy_type=ppo",
            'expert.loader_kwargs={"path": "/nonexistent/policy"}',
            f"log_root={tmp_path}",
        ])


def test_unknown_experiment_name_raises():
    from imitation_tpu.scripts.parallel import _load_experiment

    with pytest.raises(KeyError, match="unknown experiment"):
        _load_experiment("no_such_experiment")

"""Docs-as-tests: the example scripts must run end-to-end
(reference tests/test_examples.py executes tutorial notebooks)."""

import pytest


@pytest.mark.slow
def test_quickstart_runs(capsys):
    import examples.quickstart as q

    q.main()
    out = capsys.readouterr().out
    assert "BC return" in out
    assert "GAIL return" in out
    assert "AIRL return" in out


@pytest.mark.slow
def test_rlhf_example_runs(capsys):
    import examples.rlhf_preference_comparisons as r

    r.main()
    out = capsys.readouterr().out
    assert "final reward loss" in out


TUTORIALS = [
    ("examples.tutorials.t01_train_bc", {}, None),
    ("examples.tutorials.t02_train_dagger", {"total_timesteps": 1000}, None),
    ("examples.tutorials.t03_train_gail", {"total_timesteps": 4096}, None),
    ("examples.tutorials.t04_train_airl", {"total_timesteps": 4096}, None),
    ("examples.tutorials.t05_preference_comparisons",
     {"total_timesteps": 4000, "total_comparisons": 40}, "reward loss"),
    ("examples.tutorials.t05a_preference_comparisons_cnn",
     {"total_timesteps": 2000, "total_comparisons": 30}, "CNN reward loss"),
    ("examples.tutorials.t06_train_mce", {}, "occupancy gap"),
    ("examples.tutorials.t07_train_density", {"rl_timesteps": 1024}, "log-density"),
    ("examples.tutorials.t08_train_sqil", {"total_timesteps": 1000}, None),
    ("examples.tutorials.t08a_train_sqil_sac", {"total_timesteps": 500}, None),
    ("examples.tutorials.t09_compare_baselines", {"n_seeds": 2, "n_epochs": 1}, "P(BC > random)"),
    ("examples.tutorials.t10_train_custom_env", {"ppo_iters": 5}, "BC return"),
    ("examples.tutorials.t11_multichip", {"n_rounds": 4}, "resumed on mesh"),
]


@pytest.mark.slow
@pytest.mark.parametrize("module,kwargs,expect", TUTORIALS,
                         ids=[m.rsplit(".", 1)[1] for m, _, _ in TUTORIALS])
def test_tutorial_runs(module, kwargs, expect, capsys):
    """Docs-as-tests over the full tutorial set (reference runs its 12
    notebooks via pytest-notebook, tests/test_examples.py:44-50)."""
    import importlib

    mod = importlib.import_module(module)
    mod.main(**kwargs)
    out = capsys.readouterr().out
    if expect is not None:
        assert expect in out

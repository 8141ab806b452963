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

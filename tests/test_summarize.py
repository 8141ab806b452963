"""Benchmark summarizer tests: per-seed dedupe policy, IQM/CI stats,
probability of improvement (reference benchmarking/ summarizers)."""

import json

import numpy as np

from benchmarking.summarize import (
    iqm,
    latest_per_seed,
    parity_markdown,
    probability_of_improvement,
)


def test_latest_per_seed_latest_ts_wins():
    rows = [
        {"seed": 0, "return": 100.0, "ts": 1.0},
        {"seed": 0, "return": 300.0, "ts": 2.0},  # rerun supersedes
        {"seed": 1, "return": 200.0, "ts": 1.5},
    ]
    out = latest_per_seed(rows)
    assert out[0]["return"] == 300.0
    assert out[1]["return"] == 200.0


def test_latest_per_seed_complete_beats_newer_partial():
    rows = [
        {"seed": 0, "return": 300.0, "ts": 1.0},
        {"seed": 0, "return": 80.0, "ts": 2.0, "partial": True},
    ]
    assert latest_per_seed(rows)[0]["return"] == 300.0
    # ...but a partial stands in when it is all we have.
    assert latest_per_seed(rows[1:])[0]["return"] == 80.0


def test_latest_per_seed_missing_seed_defaults_to_zero():
    rows = [{"return": 1.0, "ts": 1.0}, {"seed": 0, "return": 2.0, "ts": 2.0}]
    out = latest_per_seed(rows)
    assert list(out) == [0] and out[0]["return"] == 2.0


def test_iqm_middle_half():
    # IQM of 0..11 = mean of 3..8.
    assert iqm(np.arange(12)) == np.arange(3, 9).mean()


def test_probability_of_improvement():
    assert probability_of_improvement([2, 2], [1, 1]) == 1.0
    assert probability_of_improvement([1], [1]) == 0.5


def test_parity_markdown_dedupes_stale_rows(tmp_path):
    results = {
        "bc/seals_swimmer": [
            {"seed": 0, "return": 146.7, "ts": 1.0},  # aborted early run
            {"seed": 0, "return": 305.9, "ts": 2.0},  # rerun, same seed
            {"seed": 1, "return": 300.0, "ts": 1.0},
        ]
    }
    rp = tmp_path / "results.json"
    rp.write_text(json.dumps(results))
    md = parity_markdown(str(rp), experts_path=str(tmp_path / "none.json"))
    row = [ln for ln in md.splitlines() if "bc/seals_swimmer" in ln][0]
    cells = [c.strip() for c in row.split("|")]
    assert cells[2] == "2"  # seeds deduped to 2
    assert abs(float(cells[3]) - np.mean([305.9, 300.0])) < 0.1

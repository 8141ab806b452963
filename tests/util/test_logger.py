"""HierarchicalLogger tests (reference tests/util/test_logger.py, 321 LoC)."""

import csv
import os

import pytest

from imitation_tpu.util.logger import configure


def read_csv(path):
    with open(path, newline="") as f:
        return list(csv.DictReader(f))


def test_basic_record_dump(tmp_path):
    logger = configure(str(tmp_path), ["csv"])
    logger.record("a", 1.0)
    logger.record("b", 2.0)
    logger.dump(step=0)
    rows = read_csv(tmp_path / "progress.csv")
    assert rows[0]["a"] == "1.0"
    assert rows[0]["b"] == "2.0"


def test_accumulate_means_semantics(tmp_path):
    """Raw values go to the sub-logger; means accumulate into the default
    logger under mean/{name}/... and flush on the next default dump."""
    logger = configure(str(tmp_path), ["csv"])
    with logger.accumulate_means("gen"):
        logger.record("loss", 1.0)
        logger.dump(step=0)
        logger.record("loss", 3.0)
        logger.dump(step=1)
    logger.record("outer", 42)
    logger.dump(step=2)
    # default CSV has the mean of the two recorded values
    rows = read_csv(tmp_path / "progress.csv")
    assert float(rows[0]["mean/gen/loss"]) == 2.0
    assert rows[0]["outer"] == "42"
    # raw CSV contains both raw values
    raw_rows = read_csv(tmp_path / "raw" / "gen" / "progress.csv")
    assert [r["raw/gen/loss"] for r in raw_rows] == ["1.0", "3.0"]


def test_accumulate_means_nested_raises(tmp_path):
    logger = configure(str(tmp_path), [])
    with logger.accumulate_means("a"):
        with pytest.raises(RuntimeError, match="[Nn]ested"):
            with logger.accumulate_means("b"):
                pass


def test_key_prefix(tmp_path):
    logger = configure(str(tmp_path), ["csv"])
    with logger.add_key_prefix("pref"):
        logger.record("x", 1)
    logger.dump(0)
    rows = read_csv(tmp_path / "progress.csv")
    assert "pref/x" in rows[0]


def test_accumulate_prefix(tmp_path):
    logger = configure(str(tmp_path), ["csv"])
    with logger.add_accumulate_prefix("wrapped"):
        with logger.accumulate_means("gen"):
            logger.record("loss", 5.0)
            logger.dump(0)
    logger.dump(0)
    rows = read_csv(tmp_path / "progress.csv")
    assert float(rows[0]["mean/wrapped/gen/loss"]) == 5.0


def test_accumulate_prefix_inside_context_raises(tmp_path):
    logger = configure(str(tmp_path), [])
    with logger.accumulate_means("gen"):
        with pytest.raises(RuntimeError):
            with logger.add_accumulate_prefix("x"):
                pass


def test_csv_adds_columns_lazily(tmp_path):
    logger = configure(str(tmp_path), ["csv"])
    logger.record("a", 1)
    logger.dump(0)
    logger.record("a", 2)
    logger.record("b", 3)
    logger.dump(1)
    rows = read_csv(tmp_path / "progress.csv")
    assert rows[0]["b"] == ""
    assert rows[1]["b"] == "3"


def test_json_output(tmp_path):
    import json

    logger = configure(str(tmp_path), ["json"])
    logger.record("k", 1.5)
    logger.dump(7)
    with open(tmp_path / "progress.json") as f:
        rec = json.loads(f.readline())
    assert rec["k"] == 1.5
    assert rec["_step"] == 7


def test_record_mean_outside_context(tmp_path):
    logger = configure(str(tmp_path), ["csv"])
    logger.record_mean("m", 1.0)
    logger.record_mean("m", 3.0)
    logger.dump(0)
    rows = read_csv(tmp_path / "progress.csv")
    assert float(rows[0]["m"]) == 2.0


def test_tensorboard_output(tmp_path):
    import glob

    logger = configure(str(tmp_path), ["tensorboard"])
    logger.record("metric", 1.0)
    logger.dump(step=3)
    logger.close()
    events = glob.glob(str(tmp_path / "events.out.tfevents*"))
    assert events, "no tensorboard event files written"


def test_hard_interleaved_contexts(tmp_path):
    """Reference test_hard (tests/util/test_logger.py:163-233): interleaved
    accumulate contexts, means flushed per outer dump, raw sub-logs appended
    across re-entries, missing keys blank in CSV."""
    logger = configure(str(tmp_path), ["csv"])
    logger.record("no_context", 1)
    with logger.accumulate_means("disc"):
        logger.record("C", 2)
        logger.record("D", 2)
        logger.dump(step=0)
        logger.record("C", 4)
        logger.dump(step=1)
    with logger.accumulate_means("gen"):
        logger.record("E", 2)
        logger.dump(step=0)
        logger.record("E", 0)
        logger.dump(step=1)
    with logger.accumulate_means("disc"):
        logger.record("C", 3)
        logger.dump(step=2)
    logger.dump(step=0)

    rows = read_csv(tmp_path / "progress.csv")
    assert float(rows[0]["mean/disc/C"]) == 3.0  # mean(2, 4, 3)
    assert float(rows[0]["mean/disc/D"]) == 2.0
    assert float(rows[0]["mean/gen/E"]) == 1.0  # mean(2, 0)
    assert rows[0]["no_context"] == "1"
    raw_disc = read_csv(tmp_path / "raw" / "disc" / "progress.csv")
    assert [r["raw/disc/C"] for r in raw_disc] == ["2", "4", "3"]
    assert [r.get("raw/disc/D", "") for r in raw_disc] == ["2", "", ""]
    raw_gen = read_csv(tmp_path / "raw" / "gen" / "progress.csv")
    assert [r["raw/gen/E"] for r in raw_gen] == ["2", "0"]

    # Part two: appending after the first mean flush.
    with logger.accumulate_means("disc"):
        logger.record("D", 100)
        logger.dump(step=3)
    logger.record("no_context", 2)
    logger.dump(step=1)
    rows = read_csv(tmp_path / "progress.csv")
    assert len(rows) == 2
    assert float(rows[1]["mean/disc/D"]) == 100.0
    assert rows[1].get("mean/gen/E", "") == ""
    assert rows[1]["no_context"] == "2"
    raw_disc = read_csv(tmp_path / "raw" / "disc" / "progress.csv")
    assert [r.get("raw/disc/D", "") for r in raw_disc] == ["2", "", "", "100"]


def test_wandb_format_import_error(monkeypatch):
    """Requesting wandb output without wandb installed raises a clear error
    (reference test_wandb_module_import_error)."""
    import builtins
    import importlib

    import imitation_tpu.util.logger as logmod

    real_import = builtins.__import__

    def fake_import(name, *args, **kwargs):
        if name == "wandb":
            raise ModuleNotFoundError("No module named 'wandb'")
        return real_import(name, *args, **kwargs)

    monkeypatch.setattr(builtins, "__import__", fake_import)
    with pytest.raises(ModuleNotFoundError, match="wandb"):
        logmod.WandbOutputFormat()


def test_wandb_format_logs_via_stub(monkeypatch, tmp_path):
    """WandbOutputFormat forwards records to wandb.log (reference
    test_wandb_output_format)."""
    import sys
    import types as pytypes

    import imitation_tpu.util.logger as logmod

    calls = []
    stub = pytypes.ModuleType("wandb")
    stub.log = lambda kvs, step=None: calls.append((dict(kvs), step))
    monkeypatch.setitem(sys.modules, "wandb", stub)
    fmt = logmod.WandbOutputFormat()
    fmt.write({"a": 1.0, "b": 2.0}, step=7)
    assert calls == [({"a": 1.0, "b": 2.0}, 7)]

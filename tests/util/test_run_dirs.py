"""Run-dir utilities (reference util/sacred.py equivalents)."""

import json
import pathlib

import pytest

from imitation_tpu.util import run_dirs


def _make_run(root, name):
    d = pathlib.Path(root) / name
    d.mkdir(parents=True)
    (d / "config.json").write_text(json.dumps({"seed": 1}))
    (d / "run.json").write_text(json.dumps({"status": "COMPLETED"}))
    return d


def test_run_dicts_load(tmp_path):
    d = _make_run(tmp_path, "a/run1")
    rd = run_dirs.RunDicts.load_from_dir(d)
    assert rd.config["seed"] == 1
    assert rd.run["status"] == "COMPLETED"


def test_filter_subdirs_finds_runs(tmp_path):
    d1 = _make_run(tmp_path, "x/run1")
    d2 = _make_run(tmp_path, "y/run2")
    (tmp_path / "z").mkdir()
    found = run_dirs.filter_subdirs(tmp_path)
    assert set(found) == {d1, d2}


def test_filter_subdirs_nested_raises(tmp_path):
    d1 = _make_run(tmp_path, "x")
    _make_run(tmp_path, "x/inner")
    with pytest.raises(ValueError, match="nested"):
        run_dirs.filter_subdirs(tmp_path)
    assert len(run_dirs.filter_subdirs(tmp_path, nested_ok=True)) == 2


def test_link_latest(tmp_path):
    d1 = _make_run(tmp_path, "run1")
    run_dirs.link_latest(tmp_path, d1)
    latest = tmp_path / "latest"
    assert latest.is_symlink()
    assert (latest / "run.json").exists()
    d2 = _make_run(tmp_path, "run2")
    run_dirs.link_latest(tmp_path, d2)
    assert (tmp_path / "latest").resolve() == d2.resolve()

"""Script error-path tests (VERDICT r3 item 8; toward the reference's
tests/scripts/test_scripts.py error coverage): typo'd config keys, missing
demo files, corrupt checkpoints, mismatched reward-wrapper loads, failed-run
status recording, and interrupted-writer recovery."""

import json
import os

import numpy as np
import pytest

from imitation_tpu.scripts import (
    eval_policy,
    train_adversarial,
    train_imitation,
    train_rl,
)


def _latest_run_dir(root):
    dirs = []
    for env_dir in root.iterdir():
        dirs.extend(p for p in env_dir.iterdir() if p.is_dir())
    return sorted(dirs)[-1]


# --- config validation -----------------------------------------------------


def test_unknown_override_key_raises():
    """Typo'd `with a.b=c` updates are rejected like Sacred rejects unknown
    config updates (not silently written into the config)."""
    with pytest.raises(KeyError, match="unknown config key"):
        train_rl.ex.run_cli(["with", "fast", "total_timestepz=5"])


def test_unknown_nested_override_key_raises():
    with pytest.raises(KeyError, match="unknown config key"):
        train_rl.ex.run_cli(["with", "fast", "rl.no_such_knob=3"])


def test_kwargs_dicts_stay_open(tmp_path):
    """*_kwargs dicts accept arbitrary new keys (populated by callees)."""
    result = eval_policy.ex.run_cli([
        "with", "fast", f"log_root={tmp_path}",
        "explore_kwargs={'random_prob': 0.5}",
    ])
    assert "return_mean" in result


def test_unknown_command_is_not_a_command():
    """An unknown leading token is treated as a named config and rejected
    with the available list, not silently run as main."""
    with pytest.raises(KeyError, match="unknown named config"):
        train_imitation.ex.run_cli(["bcc", "with", "fast"])


# --- missing / corrupt inputs ---------------------------------------------


def test_missing_demo_path_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="does not exist"):
        train_imitation.ex.run_cli([
            "bc", "with", "fast", f"log_root={tmp_path}",
            "demonstrations.source=local",
            f"demonstrations.path={tmp_path / 'nope' / 'rollouts'}",
        ])


def test_local_demo_source_without_path_raises(tmp_path):
    with pytest.raises(ValueError, match="requires demonstrations.path"):
        train_imitation.ex.run_cli([
            "bc", "with", "fast", f"log_root={tmp_path}",
            "demonstrations.source=local",
        ])


def test_corrupt_policy_checkpoint_raises(tmp_path):
    """A truncated policy variables file fails loudly at load, not with
    silently wrong parameters."""
    train_rl.ex.run_cli(["with", "fast", f"log_root={tmp_path / 'a'}"])
    policy_dir = _latest_run_dir(tmp_path / "a") / "policies" / "final"
    vars_files = [p for p in policy_dir.iterdir() if p.suffix != ".json"]
    assert vars_files
    vars_files[0].write_bytes(b"\x00garbage")
    from imitation_tpu.policies.serialize import load_policy_from_path

    with pytest.raises(Exception):
        load_policy_from_path(str(policy_dir))


def test_warm_start_from_corrupt_checkpoint_raises(tmp_path):
    train_rl.ex.run_cli(["with", "fast", f"log_root={tmp_path / 'a'}"])
    policy_dir = _latest_run_dir(tmp_path / "a") / "policies" / "final"
    for p in policy_dir.iterdir():
        if p.suffix != ".json":
            p.write_bytes(b"corrupt")
    with pytest.raises(Exception):
        train_rl.ex.run_cli([
            "with", "fast", f"log_root={tmp_path / 'b'}",
            f"agent_path={policy_dir}",
        ])


def test_missing_reward_path_raises(tmp_path):
    with pytest.raises(Exception):
        train_rl.ex.run_cli([
            "with", "fast", f"log_root={tmp_path}",
            "reward_type=RewardNet_unshaped",
            f"reward_path={tmp_path / 'no' / 'reward'}",
        ])


def test_unshaped_reward_loaded_as_shaped_raises(tmp_path):
    """GAIL's BasicRewardNet checkpoint must not load under the shaped
    wrapper type (wrapper-prefix validation, reference
    rewards/serialize.py:115-170)."""
    train_adversarial.ex.run_cli(
        ["gail", "with", "fast", f"log_root={tmp_path / 'adv'}"]
    )
    run_dir = _latest_run_dir(tmp_path / "adv")
    reward_path = str(run_dir / "checkpoints" / "final" / "reward_train")
    with pytest.raises((TypeError, ValueError)):
        train_rl.ex.run_cli([
            "with", "fast", f"log_root={tmp_path / 'rl'}",
            "reward_type=RewardNet_shaped", f"reward_path={reward_path}",
        ])


# --- run-status recording --------------------------------------------------


def test_failed_run_records_failed_status(tmp_path):
    """An exception inside the command leaves run.json status=FAILED with
    the error (Sacred semantics; analyze --skip-failed keys off it)."""
    with pytest.raises(FileNotFoundError):
        train_imitation.ex.run_cli([
            "bc", "with", "fast", f"log_root={tmp_path}",
            "demonstrations.source=local",
            f"demonstrations.path={tmp_path / 'missing'}",
        ])
    run_dir = _latest_run_dir(tmp_path)
    run = json.loads((run_dir / "run.json").read_text())
    assert run["status"] == "FAILED"
    assert "FileNotFoundError" in run["error"]


def test_analyze_skips_failed_runs(tmp_path):
    from imitation_tpu.scripts.analyze import analyze_imitation

    # one COMPLETED and one FAILED run under the same root
    train_imitation.ex.run_cli(["bc", "with", "fast", f"log_root={tmp_path}"])
    with pytest.raises(FileNotFoundError):
        train_imitation.ex.run_cli([
            "bc", "with", "fast", f"log_root={tmp_path}",
            "demonstrations.source=local",
            f"demonstrations.path={tmp_path / 'missing'}",
        ])
    rows_all = analyze_imitation(str(tmp_path), skip_failed_runs=False)
    rows_ok = analyze_imitation(str(tmp_path), skip_failed_runs=True)
    assert len(rows_all) == len(rows_ok) + 1


def test_interrupt_records_interrupted_status(tmp_path):
    ex = train_rl.ex

    def boom(config, run_dir, logger):
        raise KeyboardInterrupt()

    old_main = ex.main_fn
    ex.main_fn = boom
    try:
        with pytest.raises(KeyboardInterrupt):
            ex.run_cli(["with", "fast", f"log_root={tmp_path}"])
    finally:
        ex.main_fn = old_main
    run = json.loads((_latest_run_dir(tmp_path) / "run.json").read_text())
    assert run["status"] == "INTERRUPTED"


# --- interrupted-writer recovery -------------------------------------------


def test_parity_record_survives_corrupt_results_file(tmp_path, monkeypatch):
    """A half-written results.json (writer killed mid-write before the
    atomic-rename layout) is quarantined, not fatal: the new result still
    lands and the corrupt bytes are preserved next to it."""
    from benchmarking import run_parity

    out = tmp_path / "parity" / "results.json"
    out.parent.mkdir(parents=True)
    out.write_text('{"gail/seals_x": [{"return": 1.0, "se')  # truncated
    monkeypatch.setattr(run_parity, "OUT_PATH", str(out))
    run_parity.record("gail", "seals_x", 0, 123.4)
    data = json.loads(out.read_text())
    assert data["gail/seals_x"][0]["return"] == 123.4
    quarantined = [p for p in out.parent.iterdir() if ".corrupt." in p.name]
    assert len(quarantined) == 1


def test_parity_record_appends_across_writers(tmp_path, monkeypatch):
    from benchmarking import run_parity

    out = tmp_path / "results.json"
    monkeypatch.setattr(run_parity, "OUT_PATH", str(out))
    for seed in range(3):
        run_parity.record("bc", "seals_y", seed, float(seed))
    data = json.loads(out.read_text())
    assert [r["seed"] for r in data["bc/seals_y"]] == [0, 1, 2]
    assert not (tmp_path / "results.json.tmp").exists()


# --- bad environment names --------------------------------------------------


def test_unknown_env_name_raises(tmp_path):
    with pytest.raises(Exception):
        train_rl.ex.run_cli([
            "with", "fast", "env_name=NoSuchEnv-v99", f"log_root={tmp_path}",
        ])


def test_eval_policy_bad_policy_path(tmp_path):
    with pytest.raises(Exception):
        eval_policy.ex.run_cli([
            "with", "fast", f"log_root={tmp_path}",
            "policy_type=ppo", f"policy_path={tmp_path / 'nothing'}",
        ])

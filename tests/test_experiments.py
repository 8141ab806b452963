"""Command-generator tests (reference tests/test_experiments.py:12-43)."""

import subprocess
import sys

import pytest

from experiments.commands import _algo_from_cfg, generate_commands


def test_generates_one_command_per_config_and_seed():
    cmds = generate_commands(
        "imitation_tpu/scripts/config_files/tuned_hps/*seals_walker*.json",
        seeds=[0, 1],
        name="run0",
    )
    # airl/bc/dagger/gail x seals_walker x 2 seeds
    assert len(cmds) == 8
    assert all("seed=0" in c or "seed=1" in c for c in cmds)
    gail = [c for c in cmds if " gail " in c]
    assert gail and all("train_adversarial gail with gail_seals_walker" in c for c in gail)
    bc = [c for c in cmds if " bc " in c]
    assert bc and all("train_imitation bc with bc_seals_walker" in c for c in bc)


def test_remote_template_wraps_command():
    cmds = generate_commands(
        "imitation_tpu/scripts/config_files/tuned_hps/gail_seals_walker.json",
        seeds=[3],
        name="r",
        remote_template='launch --name {id} --cmd "{command}"',
    )
    assert len(cmds) == 1
    assert cmds[0].startswith("launch --name r-gail-3-")
    assert 'seed=3' in cmds[0]


def test_empty_glob_raises():
    with pytest.raises(ValueError, match="no config files match"):
        generate_commands("/nonexistent/*.json", seeds=[0])


def test_algo_name_detection():
    assert _algo_from_cfg("x/gail_seals_ant.json") == "gail"
    with pytest.raises(ValueError, match="unable to find"):
        _algo_from_cfg("x/mystery_seals_ant.json")


def test_cli_prints_commands():
    out = subprocess.run(
        [sys.executable, "-m", "experiments.commands", "--seeds", "0",
         "--cfg-pattern",
         "imitation_tpu/scripts/config_files/tuned_hps/airl_seals_hopper.json"],
        capture_output=True, text=True, check=True, cwd="/root/repo",
    ).stdout
    assert "train_adversarial airl with airl_seals_hopper seed=0" in out


def test_generated_command_is_runnable_named_config():
    """The named config a generated command references actually exists on
    the target experiment (print_config-level check, reference
    tests/test_benchmarking.py:20-36)."""
    from imitation_tpu.scripts import train_adversarial

    cmds = generate_commands(
        "imitation_tpu/scripts/config_files/tuned_hps/gail_seals_hopper.json",
        seeds=[0],
    )
    stem = "gail_seals_hopper"
    assert any(f"with {stem} " in c for c in cmds)
    assert stem in train_adversarial.ex.named_configs

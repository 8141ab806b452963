"""End-to-end CLI tests with fast configs (reference tests/scripts/test_scripts.py)."""

import json
import os

import numpy as np
import pytest

from imitation_tpu.scripts import (
    eval_policy,
    train_adversarial,
    train_imitation,
    train_preference_comparisons,
    train_rl,
)


def run(ex, argv, tmp_path, sub):
    argv = list(argv) + [f"log_root={tmp_path / sub}"]
    return ex.ex.run_cli(argv) if hasattr(ex, "ex") else ex.run_cli(argv)


def _latest_run_dir(root):
    dirs = []
    for env_dir in root.iterdir():
        dirs.extend(p for p in env_dir.iterdir() if p.is_dir())
    return sorted(dirs)[-1]


def test_train_rl_fast(tmp_path):
    result = train_rl.ex.run_cli(["with", "fast", f"log_root={tmp_path}"])
    assert "return_mean" in result
    run_dir = _latest_run_dir(tmp_path)
    assert (run_dir / "config.json").exists()
    run_json = json.loads((run_dir / "run.json").read_text())
    assert run_json["status"] == "COMPLETED"
    assert (run_dir / "rollouts" / "final").exists()
    assert (run_dir / "policies" / "final" / "policy_config.json").exists()


@pytest.mark.parametrize("command", ["bc", "dagger", "sqil"])
def test_train_imitation_fast(tmp_path, command):
    result = train_imitation.ex.run_cli(
        [command, "with", "fast", f"log_root={tmp_path}"]
    )
    assert "imit_stats" in result
    assert np.isfinite(result["imit_stats"]["return_mean"])


@pytest.mark.parametrize("command", ["gail", "airl"])
def test_train_adversarial_fast(tmp_path, command):
    result = train_adversarial.ex.run_cli(
        [command, "with", "fast", f"log_root={tmp_path}"]
    )
    assert "imit_stats" in result
    run_dir = _latest_run_dir(tmp_path)
    ckpt = run_dir / "checkpoints" / "final"
    assert (ckpt / "reward_train" / "reward_config.json").exists()
    assert (ckpt / "gen_policy" / "policy_config.json").exists()


def test_train_preference_comparisons_fast(tmp_path):
    result = train_preference_comparisons.ex.run_cli(
        ["with", "fast", f"log_root={tmp_path}"]
    )
    assert result["reward_loss"] is not None
    run_dir = _latest_run_dir(tmp_path)
    assert (run_dir / "preferences.pkl").exists()


def test_train_preference_comparisons_ensemble_fast(tmp_path):
    result = train_preference_comparisons.ex.run_cli(
        ["with", "fast", "ensemble", f"log_root={tmp_path}"]
    )
    assert result["reward_loss"] is not None


def test_eval_policy_fast(tmp_path):
    result = eval_policy.ex.run_cli(["with", "fast", f"log_root={tmp_path}"])
    assert "return_mean" in result
    # scripted CartPole expert under 20-step cap: every episode returns 20
    assert result["return_mean"] == 20.0


def test_eval_policy_exploration(tmp_path):
    result = eval_policy.ex.run_cli([
        "with", "fast", f"log_root={tmp_path}",
        "explore_kwargs={'random_prob': 1.0, 'switch_prob': 1.0}",
    ])
    assert "return_mean" in result


def test_reward_transfer_roundtrip(tmp_path):
    """Train AIRL fast, then train_rl on the saved learned reward
    (reference test_transfer_learning, test_scripts.py:674)."""
    train_adversarial.ex.run_cli(
        ["airl", "with", "fast", f"log_root={tmp_path / 'adv'}"]
    )
    run_dir = _latest_run_dir(tmp_path / "adv")
    reward_path = str(run_dir / "checkpoints" / "final" / "reward_test")
    result = train_rl.ex.run_cli([
        "with", "fast", f"log_root={tmp_path / 'rl'}",
        "reward_type=RewardNet_unshaped", f"reward_path={reward_path}",
    ])
    assert "return_mean" in result


def test_print_config(capsys):
    train_rl.ex.run_cli(["print_config", "fast"])
    out = capsys.readouterr().out
    cfg = json.loads(out)
    assert cfg["total_timesteps"] == 2048


def test_convert_trajs_roundtrip(tmp_path):
    from imitation_tpu.data import serialize
    from imitation_tpu.envs import make_vec_env
    from imitation_tpu.scripts.convert_trajs import update_traj_file_in_place
    from imitation_tpu.testing import experts

    venv = make_vec_env("CartPole-v1", num_envs=2, max_episode_steps=10)
    trajs = experts.generate_expert_trajectories("CartPole-v1", venv, min_episodes=2)
    path = tmp_path / "rollouts"
    serialize.save(str(path), trajs)
    out = update_traj_file_in_place(path)
    reloaded = serialize.load(str(out))
    assert len(reloaded) == len(trajs)
    np.testing.assert_array_equal(reloaded[0].acts, trajs[0].acts)


def test_unknown_named_config_raises():
    with pytest.raises(KeyError, match="unknown named config"):
        train_rl.ex.run_cli(["with", "nonexistent_config"])


def test_train_rl_warm_start(tmp_path):
    """agent_path continues PPO training from a saved policy
    (reference ingredients/rl.py:199-231; test_scripts.py warm-start runs)."""
    train_rl.ex.run_cli(["with", "fast", f"log_root={tmp_path / 'a'}"])
    policy_dir = _latest_run_dir(tmp_path / "a") / "policies" / "final"
    result = train_rl.ex.run_cli([
        "with", "fast", f"log_root={tmp_path / 'b'}",
        f"agent_path={policy_dir}",
    ])
    assert np.isfinite(result["return_mean"])


def test_train_bc_warm_start(tmp_path):
    """agent_path initializes the BC policy (reference ingredients/bc.py:63-83)."""
    train_rl.ex.run_cli(["with", "fast", f"log_root={tmp_path / 'a'}"])
    policy_dir = _latest_run_dir(tmp_path / "a") / "policies" / "final"
    result = train_imitation.ex.run_cli([
        "bc", "with", "fast", f"log_root={tmp_path / 'b'}",
        f"agent_path={policy_dir}",
    ])
    assert np.isfinite(result["imit_stats"]["return_mean"])


def test_train_adversarial_warm_start(tmp_path):
    """agent_path warm-starts the GAIL generator."""
    train_rl.ex.run_cli(["with", "fast", f"log_root={tmp_path / 'a'}"])
    policy_dir = _latest_run_dir(tmp_path / "a") / "policies" / "final"
    result = train_adversarial.ex.run_cli([
        "gail", "with", "fast", f"log_root={tmp_path / 'b'}",
        f"agent_path={policy_dir}",
    ])
    assert np.isfinite(result["imit_stats"]["return_mean"])


def test_train_rl_sac_fast(tmp_path):
    """SAC variant end-to-end (reference test_scripts.py SAC runs)."""
    result = train_rl.ex.run_cli([
        "with", "sac", "fast", "env_name=Pendulum-v1",
        "total_timesteps=512", f"log_root={tmp_path}",
    ])
    assert np.isfinite(result["return_mean"])


def test_train_rl_double_normalization_warns(tmp_path):
    """Normalizing an already-normalized learned reward warns
    (reference test_scripts.py:768-797). The RLHF script's default
    normalize_output_layer produces the NormalizedRewardNet checkpoint."""
    train_preference_comparisons.ex.run_cli(
        ["with", "fast", f"log_root={tmp_path / 'pc'}"]
    )
    run_dir = _latest_run_dir(tmp_path / "pc")
    reward_path = str(run_dir / "checkpoints" / "final" / "reward_net")
    with pytest.warns(RuntimeWarning, match="already normalized"):
        train_rl.ex.run_cli([
            "with", "fast", f"log_root={tmp_path / 'rl'}",
            "reward_type=RewardNet_normalized", f"reward_path={reward_path}",
            "normalize_reward=True",
        ])


def test_train_rl_rejects_nonnormalized_checkpoint_as_normalized(tmp_path):
    """Loading a plain AIRL reward as RewardNet_normalized raises
    (reference test_cant_load_unnorm_as_norm semantics at the CLI)."""
    train_adversarial.ex.run_cli(
        ["airl", "with", "fast", f"log_root={tmp_path / 'adv'}"]
    )
    run_dir = _latest_run_dir(tmp_path / "adv")
    reward_path = str(run_dir / "checkpoints" / "final" / "reward_test")
    with pytest.raises(TypeError, match="RewardNet_normalized"):
        train_rl.ex.run_cli([
            "with", "fast", f"log_root={tmp_path / 'rl'}",
            "reward_type=RewardNet_normalized", f"reward_path={reward_path}",
        ])


def test_train_preference_comparisons_normalize_output_disable(tmp_path):
    result = train_preference_comparisons.ex.run_cli([
        "with", "fast", "normalize_output_disable", f"log_root={tmp_path}",
    ])
    assert result["reward_loss"] is not None


def test_train_rl_normalize_reward_runs(tmp_path):
    result = train_rl.ex.run_cli([
        "with", "fast", "normalize_reward=True", f"log_root={tmp_path}",
    ])
    assert np.isfinite(result["return_mean"])


@pytest.mark.parametrize("command", ["gail", "airl"])
def test_train_adversarial_sac(tmp_path, command):
    """SAC generator through the CLI (reference test_train_adversarial_sac,
    test_scripts.py: `rl.sac` named config; continuous env required)."""
    result = train_adversarial.ex.run_cli([
        command, "with", "fast", "sac", "env_name=Pendulum-v1",
        f"log_root={tmp_path}",
    ])
    assert np.isfinite(result["imit_stats"]["return_mean"])
    run_dir = _latest_run_dir(tmp_path)
    gp = run_dir / "checkpoints" / "final" / "gen_policy"
    cfg = json.loads((gp / "policy_config.json").read_text())
    assert cfg["policy_type"] == "sac_actor"


def test_train_rl_sac_saves_policy(tmp_path):
    result = train_rl.ex.run_cli([
        "with", "sac", "fast", "env_name=Pendulum-v1",
        "total_timesteps=256", f"log_root={tmp_path}",
    ])
    assert np.isfinite(result["return_mean"])
    run_dir = _latest_run_dir(tmp_path)
    cfg = json.loads(
        (run_dir / "policies" / "final" / "policy_config.json").read_text()
    )
    assert cfg["policy_type"] == "sac_actor"


def test_eval_policy_videos(tmp_path):
    """Video recording through eval_policy (reference eval_policy videos
    config + VideoWrapper post-wrapper)."""
    result = eval_policy.ex.run_cli([
        "with", "fast", "videos=True",
        "video_kwargs={'episodes': 1, 'fps': 10}",
        f"log_root={tmp_path}",
    ])
    assert "return_mean" in result
    run_dir = _latest_run_dir(tmp_path)
    vids = list((run_dir / "videos").iterdir())
    assert vids, "no video files written"
    assert vids[0].suffix in (".mp4", ".npz")


def test_train_preference_comparisons_sac(tmp_path):
    """PEBBLE-style RLHF through the CLI: SAC generator with replay
    relabeling (reference test_train_preference_comparisons_sac)."""
    result = train_preference_comparisons.ex.run_cli([
        "with", "fast", "sac", "env_name=Pendulum-v1",
        f"log_root={tmp_path}",
    ])
    assert result["reward_loss"] is not None
    run_dir = _latest_run_dir(tmp_path)
    cfg = json.loads(
        (run_dir / "checkpoints" / "final" / "policy" / "policy_config.json").read_text()
    )
    assert cfg["policy_type"] == "sac_actor"


def test_train_sqil_continuous_sac_variant(tmp_path):
    """SQIL auto-selects the SAC variant on continuous envs
    (reference test_sqil_*_continuous via OffPolicyAlgorithm)."""
    result = train_imitation.ex.run_cli([
        "sqil", "with", "fast", "env_name=Pendulum-v1",
        f"log_root={tmp_path}",
    ])
    assert np.isfinite(result["imit_stats"]["return_mean"])


def test_train_dagger_warm_start(tmp_path):
    """agent_path warm-starts the DAgger robot policy
    (reference test_train_dagger_warmstart)."""
    train_rl.ex.run_cli(["with", "fast", f"log_root={tmp_path / 'a'}"])
    policy_dir = _latest_run_dir(tmp_path / "a") / "policies" / "final"
    result = train_imitation.ex.run_cli([
        "dagger", "with", "fast", f"log_root={tmp_path / 'b'}",
        f"agent_path={policy_dir}",
    ])
    assert np.isfinite(result["imit_stats"]["return_mean"])

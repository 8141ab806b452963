"""Every tuned-HP named config must build (reference tests/test_benchmarking.py:20-36
requires print_config to succeed for all tuned configs)."""

import pytest

from imitation_tpu.scripts import train_adversarial, train_imitation
from imitation_tpu.scripts.tuned_hps import load_tuned_configs

CONFIGS = load_tuned_configs()


def test_tuned_configs_exist():
    assert len(CONFIGS) >= 5


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_tuned_config_builds(name):
    target = CONFIGS[name]["experiment"]
    ex = {"train_adversarial": train_adversarial.ex,
          "train_imitation": train_imitation.ex}[target]
    assert name in ex.named_configs
    config = ex.build_config([name])
    assert config["env_name"] == CONFIGS[name]["env_name"]
    # merged, not replaced: defaults still present
    assert "seed" in config
    assert "log_format_strs" in config


def test_full_seals_matrix_registered():
    """All 20 reference benchmark configs ({bc,dagger,gail,airl} x 5 seals
    envs, reference config/train_adversarial.py:168-187,
    config/train_imitation.py:96-110) are CLI named configs."""
    envs = ["ant", "half_cheetah", "hopper", "swimmer", "walker"]
    for algo in ["bc", "dagger", "gail", "airl"]:
        for env in envs:
            assert f"{algo}_seals_{env}" in CONFIGS, f"{algo}_seals_{env}"


@pytest.mark.parametrize(
    "name", [n for n in sorted(CONFIGS) if n.startswith(("gail_seals", "airl_seals"))]
)
def test_adversarial_tuned_values_match_reference(name):
    """Value-level parity with the reference's tuned_hps JSON files."""
    import json
    import os

    ref_path = (
        "/root/reference/src/imitation/scripts/config/tuned_hps/"
        f"{name}_best_hp_eval.json"
    )
    if not os.path.exists(ref_path):
        pytest.skip("reference not available")
    ref = json.load(open(ref_path))
    cfg = CONFIGS[name]
    rlk = ref["rl"]["rl_kwargs"]
    assert cfg["total_timesteps"] == ref["total_timesteps"]
    for k in ("demo_batch_size", "gen_replay_buffer_capacity",
              "n_disc_updates_per_round"):
        assert cfg["algorithm_kwargs"][k] == ref["algorithm_kwargs"][k], k
    # total on-policy batch preserved (n_steps * num_envs)
    assert cfg["rl"]["n_steps"] * cfg["num_envs"] == ref["rl"]["batch_size"]
    for ours, theirs in [("batch_size", "batch_size"), ("n_epochs", "n_epochs"),
                         ("learning_rate", "learning_rate"),
                         ("ent_coef", "ent_coef"), ("gamma", "gamma"),
                         ("gae_lambda", "gae_lambda"),
                         ("clip_range", "clip_range"), ("vf_coef", "vf_coef"),
                         ("max_grad_norm", "max_grad_norm")]:
        assert cfg["rl"][ours] == rlk[theirs], ours
    assert cfg["policy"]["normalize_features"] is True
    assert cfg["reward"]["normalize_input"] is True


@pytest.mark.parametrize(
    "name",
    [n for n in sorted(CONFIGS) if n.startswith(("bc_seals", "dagger_seals"))],
)
def test_imitation_tuned_values_match_reference(name):
    import json
    import os

    ref_path = (
        "/root/reference/src/imitation/scripts/config/tuned_hps/"
        f"{name}_best_hp_eval.json"
    )
    if not os.path.exists(ref_path):
        pytest.skip("reference not available")
    ref = json.load(open(ref_path))
    cfg = CONFIGS[name]
    bc = ref["bc"]
    assert cfg["bc"]["batch_size"] == bc["batch_size"]
    assert cfg["bc"]["l2_weight"] == bc["l2_weight"]
    assert cfg["bc"]["learning_rate"] == bc["optimizer_kwargs"]["lr"]
    assert cfg["bc"]["n_epochs"] == bc["train_kwargs"]["n_epochs"]
    if name.startswith("dagger"):
        dg = ref["dagger"]
        assert cfg["dagger"]["total_timesteps"] == dg["total_timesteps"]
        assert (cfg["dagger"]["rollout_round_min_episodes"]
                == dg["rollout_round_min_episodes"])
        kind = cfg["dagger"]["beta_schedule"]
        assert (kind == "exponential") == (
            "Exponential" in dg["beta_schedule"]["py/object"]
        )

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

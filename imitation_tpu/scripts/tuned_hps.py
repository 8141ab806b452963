"""Tuned hyperparameter registry.

Counterpart of reference ``scripts/config/tuned_hps/*.json`` (registered as
Sacred named configs, reference config/train_adversarial.py:168-187,
config/train_imitation.py:96-110): JSON files under
``scripts/config_files/tuned_hps/`` are auto-registered as named configs on
the experiment they declare, keyed by file stem — e.g.

    python -m imitation_tpu.scripts.train_adversarial gail with gail_cartpole
"""

from __future__ import annotations

import json
import pathlib
from typing import Dict

TUNED_DIR = pathlib.Path(__file__).parent / "config_files" / "tuned_hps"


def load_tuned_configs() -> Dict[str, dict]:
    configs = {}
    if TUNED_DIR.is_dir():
        for path in sorted(TUNED_DIR.glob("*.json")):
            with open(path) as f:
                configs[path.stem] = json.load(f)
    return configs


def register_tuned_configs(experiment) -> None:
    """Registers every tuned config declaring this experiment's name."""
    for name, cfg in load_tuned_configs().items():
        cfg = dict(cfg)
        target = cfg.pop("experiment", None)
        if target == experiment.name and name not in experiment.named_configs:
            experiment.named_config(name, cfg)

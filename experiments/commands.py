r"""Generate CLI commands to run training over configs x seeds.

Counterpart of reference ``experiments/commands.py`` (tested at reference
tests/test_experiments.py:12-43): takes a glob of tuned-HP config files and
a seed list and prints one runnable command per (config, seed) pair —
pipeable to ``parallel -j N``, ``xargs``, or a queue script. Commands use
our CLI's named-config surface (tuned JSONs register by file stem,
``imitation_tpu/scripts/tuned_hps.py``), so a generated command looks like:

    python -m imitation_tpu train_adversarial gail \
        with gail_seals_walker seed=0 log_root=output/run0-gail-0-1a2b3c4d

Remote/cluster execution wraps each command in ``--remote-template``, a
format string with ``{command}`` and ``{id}`` placeholders, e.g.:

    python -m experiments.commands --name run0 \
        --cfg-pattern 'imitation_tpu/scripts/config_files/tuned_hps/*.json' \
        --remote-template 'ctl job run --name {id} --command "{command}"'
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import zlib
from typing import List, Optional, Sequence

_ALGO_TO_SCRIPT = {
    "bc": "train_imitation",
    "dagger": "train_imitation",
    "gail": "train_adversarial",
    "airl": "train_adversarial",
    "sqil": "train_imitation",
}


def _algo_from_cfg(cfg_path: str) -> str:
    """Algorithm name from a config filename (reference commands.py:86-100:
    must match exactly one known algo prefix)."""
    base = os.path.basename(cfg_path)
    matches = [a for a in _ALGO_TO_SCRIPT if base.startswith(a + "_")]
    if not matches:
        raise ValueError(f"unable to find algo name in cfg file: {cfg_path}")
    if len(matches) >= 2:
        raise ValueError(f"algo name is ambiguous in cfg file: {cfg_path}")
    return matches[0]


def _cfg_id(cfg_name: str) -> str:
    """Stable short ID for a config (adler32 hex, reference :104-109)."""
    return hex(zlib.adler32(cfg_name.encode()))[2:]


def generate_commands(
    cfg_pattern: str,
    seeds: Sequence[int],
    name: str = "run0",
    log_root: str = "output",
    remote_template: Optional[str] = None,
) -> List[str]:
    """One command per (config, seed); raises on an empty glob."""
    cfg_paths = sorted(glob.glob(cfg_pattern))
    if not cfg_paths:
        raise ValueError(f"no config files match pattern: {cfg_pattern}")
    commands = []
    for cfg_path in cfg_paths:
        algo = _algo_from_cfg(cfg_path)
        script = _ALGO_TO_SCRIPT[algo]
        stem = os.path.splitext(os.path.basename(cfg_path))[0]
        # Sanity-check the config targets the script we route to.
        with open(cfg_path) as f:
            declared = json.load(f).get("experiment")
        if declared is not None and declared != script:
            raise ValueError(
                f"{cfg_path} declares experiment={declared!r} but algo "
                f"{algo!r} routes to {script}"
            )
        for seed in seeds:
            cmd_id = f"{name}-{algo}-{seed}-{_cfg_id(stem)}"
            command = (
                f"python -m imitation_tpu {script} {algo} "
                f"with {stem} seed={seed} "
                f"log_root={os.path.join(log_root, cmd_id)}"
            )
            if remote_template is not None:
                command = remote_template.format(command=command, id=cmd_id)
            commands.append(command)
    return commands


def main(argv: Optional[Sequence[str]] = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--name", default="run0", help="run-group name in IDs")
    p.add_argument(
        "--cfg-pattern",
        default=os.path.join(
            "imitation_tpu", "scripts", "config_files", "tuned_hps", "*.json"
        ),
        help="glob of tuned-HP config JSON files",
    )
    p.add_argument("--seeds", type=int, nargs="+", default=[0])
    p.add_argument("--log-root", default="output")
    p.add_argument(
        "--remote-template",
        default=None,
        help="wrap each command: format string with {command} and {id}",
    )
    args = p.parse_args(argv)
    for command in generate_commands(
        args.cfg_pattern,
        args.seeds,
        name=args.name,
        log_root=args.log_root,
        remote_template=args.remote_template,
    ):
        print(command)


if __name__ == "__main__":
    main()

"""convert_trajs: migrate legacy rollout files to the current format.

Counterpart of reference ``scripts/convert_trajs.py`` (:20-52): loads
trajectories from any supported format (npz/HF-datasets dir) and re-saves
in the current on-disk format next to the original.

CLI: ``python -m imitation_tpu.scripts.convert_trajs path1 [path2 ...]``
"""

from __future__ import annotations

import pathlib
import sys

from imitation_tpu.data import serialize
from imitation_tpu.util import util


def update_traj_file_in_place(path) -> pathlib.Path:
    """Converts a file in place (reference convert_trajs.py:20-43)."""
    path = util.parse_path(path)
    trajs = serialize.load(str(path))
    converted_path = path.with_suffix("") if path.suffix == ".npz" else path
    serialize.save(str(converted_path), trajs)
    return converted_path


def main() -> None:
    if len(sys.argv) <= 1:
        print("Supply at least one path to convert", file=sys.stderr)
        raise SystemExit(1)
    for path in sys.argv[1:]:
        out = update_traj_file_in_place(path)
        print(f"converted {path} -> {out}")


if __name__ == "__main__":
    main()

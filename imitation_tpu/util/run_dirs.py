"""Run-directory utilities.

Counterpart of reference ``util/sacred.py`` (:17-123) and
``util/sacred_file_parsing.py``: every CLI run writes ``config.json`` /
``run.json`` into its run dir (scripts/config.py), so the reference's
SacredDicts loader, run-dir filtering, and symlinking map onto these
directories directly (there is no separate Sacred observer dir to link to —
the run dir IS the record; ``link_latest`` maintains the convenience
symlink instead).
"""

from __future__ import annotations

import json
import os
import pathlib
from typing import Callable, NamedTuple, Sequence


class RunDicts(NamedTuple):
    """config.json + run.json of one run dir (reference SacredDicts, :17-31)."""

    run_dir: pathlib.Path
    config: dict
    run: dict

    @classmethod
    def load_from_dir(cls, run_dir) -> "RunDicts":
        run_dir = pathlib.Path(run_dir)
        return cls(
            run_dir=run_dir,
            config=json.loads((run_dir / "config.json").read_text()),
            run=json.loads((run_dir / "run.json").read_text()),
        )


def dir_contains_run_jsons(dir_path: pathlib.Path) -> bool:
    """reference dir_contains_sacred_jsons (:34-37)."""
    dir_path = pathlib.Path(dir_path)
    return (dir_path / "run.json").is_file() and (dir_path / "config.json").is_file()


def filter_subdirs(
    root_dir,
    filter_fn: Callable[[pathlib.Path], bool] = dir_contains_run_jsons,
    *,
    nested_ok: bool = False,
) -> Sequence[pathlib.Path]:
    """Walks a tree returning subdirs passing ``filter_fn``
    (reference filter_subdirs, :40-77; raises on nesting unless allowed)."""
    root_dir = pathlib.Path(root_dir)
    filtered = set()
    for root_str, _, _ in os.walk(root_dir, followlinks=False):
        root = pathlib.Path(root_str)
        if filter_fn(root):
            filtered.add(root)
    if not nested_ok:
        for d in filtered:
            for other in filtered:
                if d != other and other in d.parents:
                    raise ValueError(
                        f"Found nested directories: {d} and {other}",
                    )
    return sorted(filtered)


def link_latest(log_root, run_dir) -> None:
    """Maintains ``{log_root}/latest`` -> newest run dir (relative symlink,
    overwritten per run — the role of reference build_sacred_symlink :79-112)."""
    log_root = pathlib.Path(log_root)
    symlink_path = log_root / "latest"
    target = pathlib.Path(os.path.relpath(run_dir, start=log_root))
    if symlink_path.is_symlink():
        symlink_path.unlink()
    if symlink_path.exists():
        return  # a real directory named "latest": leave it alone
    try:
        symlink_path.symlink_to(target, target_is_directory=True)
    except OSError:
        pass  # e.g. filesystems without symlink support

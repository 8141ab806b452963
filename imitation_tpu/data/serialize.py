"""Trajectory (de)serialization.

Counterpart of reference ``data/serialize.py`` + ``huggingface_utils.py``:
save/load ``Sequence[Trajectory]`` using the HuggingFace ``datasets`` on-disk
format (so rollouts saved by the reference library load here and vice versa),
with an ``.npz`` fallback and legacy-format loading.

Format parity: columns ``obs``, ``acts``, ``rews``, ``infos`` (jsonpickled
when available, else json), ``terminal`` — matching the reference's
``trajectories_to_dict`` (reference huggingface_utils.py:90-157).
"""

from __future__ import annotations

import json
import os
import warnings
from typing import Sequence

import numpy as np

from imitation_tpu.data import types


def _infos_to_strs(infos, length: int):
    if infos is None:
        infos = [{}] * length
    out = []
    for info in infos:
        try:
            out.append(json.dumps(info, default=str))
        except TypeError:
            out.append("{}")
    return out


def save(path: str, trajectories: Sequence[types.Trajectory]) -> None:
    """Saves trajectories to ``path`` (reference serialize.py:15-24).

    Uses HF ``datasets`` save_to_disk when available, else a .npz directory.
    """
    try:
        import datasets

        has_rew = all(isinstance(t, types.TrajectoryWithRew) for t in trajectories)
        d = {
            "obs": [np.asarray(types.maybe_unwrap_dictobs(t.obs)) for t in trajectories],
            "acts": [np.asarray(t.acts) for t in trajectories],
            "infos": [_infos_to_strs(t.infos, len(t)) for t in trajectories],
            "terminal": [bool(t.terminal) for t in trajectories],
        }
        if has_rew:
            d["rews"] = [np.asarray(t.rews) for t in trajectories]
        ds = datasets.Dataset.from_dict(d)
        ds.save_to_disk(path)
        return
    except ImportError:
        pass
    _save_npz(path, trajectories)


def _save_npz(path: str, trajectories: Sequence[types.Trajectory]) -> None:
    os.makedirs(path, exist_ok=True)
    has_rew = all(isinstance(t, types.TrajectoryWithRew) for t in trajectories)
    arrays = {}
    for i, t in enumerate(trajectories):
        arrays[f"obs_{i}"] = np.asarray(types.maybe_unwrap_dictobs(t.obs))
        arrays[f"acts_{i}"] = np.asarray(t.acts)
        arrays[f"terminal_{i}"] = np.asarray(t.terminal)
        if has_rew:
            arrays[f"rews_{i}"] = np.asarray(t.rews)
    arrays["n"] = np.asarray(len(trajectories))
    np.savez_compressed(os.path.join(path, "trajectories.npz"), **arrays)


def load(path: str) -> Sequence[types.Trajectory]:
    """Loads trajectories saved by ``save`` (reference serialize.py:27-72)."""
    npz_path = os.path.join(path, "trajectories.npz")
    if os.path.exists(npz_path):
        return _load_npz(npz_path)
    if os.path.isdir(path) and os.path.exists(os.path.join(path, "dataset_info.json")):
        return _load_hf(path)
    # legacy single-file formats
    if path.endswith(".npz") and os.path.exists(path):
        warnings.warn("Loading legacy npz trajectory format", DeprecationWarning)
        with np.load(path, allow_pickle=True) as data:
            if "indices" in data.files:
                return _load_reference_npz(data)
        return _load_npz(path)
    if path.endswith(".pkl") and os.path.exists(path):
        # Reference pre-npz pickle format: a pickled list of trajectories
        # (reference data/serialize.py:47-49). Dataclass module paths differ,
        # so map by field.
        warnings.warn("Loading legacy pickle trajectory format", DeprecationWarning)
        return _load_reference_pkl(path)
    raise FileNotFoundError(f"no trajectory data found at {path!r}")


def _load_reference_npz(data) -> Sequence[types.Trajectory]:
    """Decodes the reference's legacy flat-array npz trajectory format:
    concatenated obs/acts/rews + per-trajectory split ``indices`` and
    ``terminal`` flags (reference data/serialize.py:50-67). Each trajectory
    has one more obs than acts, so obs split points shift by +i+1."""
    num = len(data["indices"])
    idx = np.asarray(data["indices"])
    obs = np.split(data["obs"], idx + np.arange(num) + 1)
    acts = np.split(data["acts"], idx)
    rews = np.split(data["rews"], idx) if "rews" in data.files else None
    terminal = np.asarray(data["terminal"])
    out = []
    for i in range(len(terminal)):
        kwargs = dict(
            obs=obs[i], acts=acts[i], infos=None, terminal=bool(terminal[i])
        )
        if rews is not None:
            out.append(
                types.TrajectoryWithRew(rews=rews[i].astype(np.float64), **kwargs)
            )
        else:
            out.append(types.Trajectory(**kwargs))
    return out


def _load_reference_pkl(path: str) -> Sequence[types.Trajectory]:
    import pickle

    class _FieldMapper(pickle.Unpickler):
        """Resolves the reference's Trajectory classes to ours by name."""

        def find_class(self, module, name):
            if name == "TrajectoryWithRew":
                return types.TrajectoryWithRew
            if name == "Trajectory":
                return types.Trajectory
            return super().find_class(module, name)

    with open(path, "rb") as f:
        head = f.read(12)
        f.seek(0)
        if head.startswith(b"version http"):
            raise ValueError(
                f"{path!r} is a git-lfs pointer, not pickle data; "
                "run `git lfs pull` in the source repo first"
            )
        data = _FieldMapper(f).load()
    return list(data)


def _load_hf(path: str) -> Sequence[types.TrajectoryWithRew]:
    import datasets

    ds = datasets.load_from_disk(path)
    ds.set_format("numpy")
    out = []
    has_rew = "rews" in ds.column_names
    for row in ds:
        infos = None
        if "infos" in row:
            try:
                infos = np.array([json.loads(s) for s in row["infos"]])
            except Exception:
                infos = None
        kwargs = dict(
            obs=np.asarray(row["obs"]),
            acts=np.asarray(row["acts"]),
            infos=infos,
            terminal=bool(row["terminal"]),
        )
        if has_rew:
            out.append(
                types.TrajectoryWithRew(
                    rews=np.asarray(row["rews"], np.float64), **kwargs
                )
            )
        else:
            out.append(types.Trajectory(**kwargs))
    return out


def _load_npz(npz_path: str) -> Sequence[types.Trajectory]:
    data = np.load(npz_path, allow_pickle=False)
    n = int(data["n"])
    out = []
    for i in range(n):
        kwargs = dict(
            obs=data[f"obs_{i}"],
            acts=data[f"acts_{i}"],
            infos=None,
            terminal=bool(data[f"terminal_{i}"]),
        )
        if f"rews_{i}" in data:
            out.append(
                types.TrajectoryWithRew(
                    rews=data[f"rews_{i}"].astype(np.float64), **kwargs
                )
            )
        else:
            out.append(types.Trajectory(**kwargs))
    return out

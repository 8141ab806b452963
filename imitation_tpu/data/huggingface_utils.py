"""HuggingFace ``datasets`` interop for trajectories.

Counterpart of reference ``data/huggingface_utils.py`` (157 LoC):
``TrajectoryDatasetSequence`` wraps an HF dataset as a lazily-decoded
sequence of ``Trajectory`` objects, and ``trajectories_to_dict`` /
``trajectories_to_dataset`` convert the other way. The column format matches
the reference (obs/acts/rews/infos/terminal), so datasets written by either
library load in both.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Sequence

import numpy as np

from imitation_tpu.data import types


class TrajectoryDatasetSequence:
    """A Sequence[Trajectory] view of an HF dataset (reference :11-88).

    Rows are decoded lazily and cached — large demo datasets stay memory-
    mapped on disk until accessed.
    """

    def __init__(self, dataset):
        self._dataset = dataset
        self._cache: Dict[int, types.Trajectory] = {}
        self._has_rew = "rews" in dataset.column_names

    def __len__(self) -> int:
        return len(self._dataset)

    def __getitem__(self, idx):
        if isinstance(idx, slice):
            return [self[i] for i in range(*idx.indices(len(self)))]
        if idx < 0:
            idx += len(self)
        if idx not in self._cache:
            self._cache[idx] = self._decode(self._dataset[int(idx)])
        return self._cache[idx]

    def _decode(self, row) -> types.Trajectory:
        infos = None
        if "infos" in row and row["infos"] is not None:
            try:
                infos = np.array([json.loads(s) for s in row["infos"]])
            except (TypeError, json.JSONDecodeError):
                infos = None
        kwargs = dict(
            obs=np.asarray(row["obs"]),
            acts=np.asarray(row["acts"]),
            infos=infos,
            terminal=bool(row["terminal"]),
        )
        if self._has_rew:
            return types.TrajectoryWithRew(
                rews=np.asarray(row["rews"], np.float64), **kwargs
            )
        return types.Trajectory(**kwargs)

    @property
    def dataset(self):
        return self._dataset


def trajectories_to_dict(trajectories: Sequence[types.Trajectory]) -> Dict[str, Any]:
    """Trajectories -> HF-compatible column dict (reference :90-157)."""
    has_rew = all(isinstance(t, types.TrajectoryWithRew) for t in trajectories)
    d: Dict[str, Any] = {
        "obs": [np.asarray(types.maybe_unwrap_dictobs(t.obs)) for t in trajectories],
        "acts": [np.asarray(t.acts) for t in trajectories],
        "infos": [
            [json.dumps(i, default=str) for i in (t.infos if t.infos is not None else [{}] * len(t))]
            for t in trajectories
        ],
        "terminal": [bool(t.terminal) for t in trajectories],
    }
    if has_rew:
        d["rews"] = [np.asarray(t.rews) for t in trajectories]
    return d


def trajectories_to_dataset(trajectories: Sequence[types.Trajectory]):
    """Trajectories -> in-memory HF dataset."""
    import datasets

    return datasets.Dataset.from_dict(trajectories_to_dict(trajectories))

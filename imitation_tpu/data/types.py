"""Trajectory and transition types.

Two tiers, by design:

* **Host tier** — frozen numpy dataclasses (`Trajectory`, `TrajectoryWithRew`,
  `TransitionsMinimal`, `Transitions`, `TransitionsWithRew`) plus `DictObs`.
  These mirror the semantics of the reference library's
  ``data/types.py`` (reference: src/imitation/data/types.py:38-638): shape and
  dtype validation, ``len(obs) == len(acts) + 1``, slicing/indexing, and
  dataset interop. They are the user-facing currency for demonstrations on the
  host (loading, saving, inspecting).

* **Device tier** — `TrajectoryBatch` and `TransitionBatch`, flax.struct
  pytrees of fixed-shape (padded + masked) arrays that live in HBM and flow
  through jitted programs. Variable-length episodes are represented as padded
  ``[B, T, ...]`` arrays with per-trajectory lengths; this is the TPU-native
  answer to the reference's list-of-ragged-ndarrays representation.

Conversion helpers (`transitions_from_trajectories`, `TransitionBatch.from_host`,
...) bridge the tiers once, outside jit.
"""

from __future__ import annotations

import dataclasses
import numbers
from typing import Any, Dict, Iterable, Mapping, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# ---------------------------------------------------------------------------
# DictObs
# ---------------------------------------------------------------------------


class DictObs:
    """A dict of arrays behaving like an array over its first axis.

    Mirrors the reference ``DictObs`` contract
    (reference: src/imitation/data/types.py:38-202): ``len``, integer/slice
    indexing applied to every value, ``shape``/``dtype`` views, stacking and
    concatenation over the first axis. In JAX code a plain dict pytree is
    preferred; this wrapper exists for host-side API parity and validation.
    """

    def __init__(self, d: Mapping[str, np.ndarray]):
        if not isinstance(d, Mapping):
            raise TypeError(f"DictObs requires a mapping, got {type(d)}")
        self._d: Dict[str, np.ndarray] = {k: np.asarray(v) for k, v in d.items()}

    # -- mapping access ----------------------------------------------------
    @property
    def unwrap(self) -> Dict[str, np.ndarray]:
        return dict(self._d)

    def get(self, key: str) -> np.ndarray:
        return self._d[key]

    def keys(self):
        return self._d.keys()

    def values(self):
        return self._d.values()

    def items(self):
        return self._d.items()

    # -- array-like protocol ----------------------------------------------
    def __len__(self) -> int:
        lens = {k: len(v) for k, v in self._d.items()}
        unique = set(lens.values())
        if len(unique) != 1:
            raise RuntimeError(f"observations of conflicting lengths: {lens}")
        return unique.pop()

    def __getitem__(self, idx) -> "DictObs":
        if isinstance(idx, numbers.Integral):
            # Keep dict structure; scalar-indexing every value (matches
            # reference behavior of returning a DictObs of unbatched values).
            return DictObs({k: v[idx] for k, v in self._d.items()})
        return DictObs({k: v[idx] for k, v in self._d.items()})

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    def __eq__(self, other) -> bool:
        if not isinstance(other, DictObs):
            return False
        if self._d.keys() != other._d.keys():
            return False
        return all(np.array_equal(self._d[k], other._d[k]) for k in self._d)

    @property
    def shape(self) -> Dict[str, Tuple[int, ...]]:
        return {k: v.shape for k, v in self._d.items()}

    @property
    def dtype(self) -> Dict[str, np.dtype]:
        return {k: v.dtype for k, v in self._d.items()}

    def map_arrays(self, fn) -> "DictObs":
        return DictObs({k: fn(v) for k, v in self._d.items()})

    # -- combination -------------------------------------------------------
    @staticmethod
    def _unravel(items: Iterable["DictObs"]) -> Dict[str, list]:
        items = list(items)
        if not items:
            raise ValueError("empty input")
        keys = items[0]._d.keys()
        for it in items:
            if it._d.keys() != keys:
                raise ValueError("DictObs keys must match to combine")
        return {k: [it._d[k] for it in items] for k in keys}

    @classmethod
    def stack(cls, items: Iterable["DictObs"]) -> "DictObs":
        return cls({k: np.stack(v) for k, v in cls._unravel(items).items()})

    @classmethod
    def concatenate(cls, items: Iterable["DictObs"]) -> "DictObs":
        return cls({k: np.concatenate(v) for k, v in cls._unravel(items).items()})

    def __repr__(self) -> str:
        return f"DictObs({self._d})"


Observation = Union[np.ndarray, DictObs]
ObsVar = Observation


def maybe_wrap_in_dictobs(obs) -> Observation:
    """Wraps a mapping in DictObs, passes arrays through.

    Reference: src/imitation/data/types.py:254-263.
    """
    if isinstance(obs, (dict, Mapping)):
        return DictObs(obs)
    return np.asarray(obs) if not isinstance(obs, DictObs) else obs


def maybe_unwrap_dictobs(obs):
    """Unwraps DictObs into a plain dict, passes arrays through."""
    if isinstance(obs, DictObs):
        return obs.unwrap
    return obs


def assert_not_dictobs(x, msg: str = "Dict observations are not supported here"):
    if isinstance(x, (DictObs, dict)):
        raise ValueError(msg)
    return x


def stack_maybe_dictobs(obs_list: Sequence[Observation]) -> Observation:
    if isinstance(obs_list[0], DictObs):
        return DictObs.stack(obs_list)
    return np.stack(obs_list)


def concatenate_maybe_dictobs(obs_list: Sequence[Observation]) -> Observation:
    if isinstance(obs_list[0], DictObs):
        return DictObs.concatenate(obs_list)
    return np.concatenate(obs_list)


# ---------------------------------------------------------------------------
# Host trajectories
# ---------------------------------------------------------------------------


def _obs_len(obs: Observation) -> int:
    return len(obs)


@dataclasses.dataclass(frozen=True, eq=False)
class Trajectory:
    """A trajectory: observations, actions, infos, terminal flag.

    Invariants enforced (reference: src/imitation/data/types.py:336-428):
    ``len(obs) == len(acts) + 1``; ``infos`` is None or length ``len(acts)``.
    """

    obs: Observation
    acts: np.ndarray
    infos: Optional[np.ndarray]
    terminal: bool

    def __len__(self) -> int:
        return len(self.acts)

    def __post_init__(self):
        object.__setattr__(self, "acts", np.asarray(self.acts))
        object.__setattr__(self, "obs", maybe_wrap_in_dictobs(self.obs))
        if len(self.acts) == 0:
            raise ValueError(
                "Degenerate trajectory: must have at least one action."
            )
        if _obs_len(self.obs) != len(self.acts) + 1:
            raise ValueError(
                "expected one more observation than actions: "
                f"{_obs_len(self.obs)} != {len(self.acts)} + 1",
            )
        if self.infos is not None and len(self.infos) != len(self.acts):
            raise ValueError(
                "infos when present must be present for each action: "
                f"{len(self.infos)} != {len(self.acts)}",
            )

    def __eq__(self, other) -> bool:
        if not isinstance(other, Trajectory):
            return False
        if dataclasses.fields(self) != dataclasses.fields(other):
            return False
        for f in dataclasses.fields(self):
            a, b = getattr(self, f.name), getattr(other, f.name)
            if f.name == "infos":
                a = a if a is not None else []
                b = b if b is not None else []
                if len(a) != len(b) or any(x != y for x, y in zip(a, b)):
                    return False
            elif isinstance(a, DictObs):
                if a != b:
                    return False
            elif isinstance(a, np.ndarray):
                if not np.array_equal(a, b):
                    return False
            else:
                if a != b:
                    return False
        return True

    def __getitem__(self, key):
        if isinstance(key, slice):
            start, stop, step = key.indices(len(self))
            if step != 1:
                raise ValueError("only contiguous slices with step 1 supported")
            d = dataclass_quick_asdict(self)
            d["obs"] = self.obs[start : stop + 1]
            d["acts"] = self.acts[start:stop]
            if d.get("infos") is not None:
                d["infos"] = d["infos"][start:stop]
            for k in ("rews",):
                if k in d:
                    d[k] = d[k][start:stop]
            if stop < len(self):
                d["terminal"] = False
            return dataclasses.replace(self, **d)
        # integer index -> timestep tuple
        d = dataclass_quick_asdict(self)
        out = {k: v[key] if v is not None and k != "terminal" else v for k, v in d.items()}
        return out


def dataclass_quick_asdict(obj) -> Dict[str, Any]:
    """Shallow asdict (no deep-copying of arrays).

    Reference: src/imitation/data/types.py:305-318.
    """
    return {f.name: getattr(obj, f.name) for f in dataclasses.fields(obj)}


@dataclasses.dataclass(frozen=True, eq=False)
class TrajectoryWithRew(Trajectory):
    """Trajectory carrying per-step float rewards.

    Reference: src/imitation/data/types.py:430-445.
    """

    rews: np.ndarray

    def __post_init__(self):
        super().__post_init__()
        object.__setattr__(self, "rews", np.asarray(self.rews))
        if self.rews.shape != (len(self.acts),):
            raise ValueError(
                f"rewards must be 1D array, one entry for each action: "
                f"{self.rews.shape} != ({len(self.acts)},)",
            )
        if not np.issubdtype(self.rews.dtype, np.floating):
            raise ValueError(f"rewards dtype {self.rews.dtype} not a float")


AnyTrajectory = Union[Trajectory, TrajectoryWithRew]


# ---------------------------------------------------------------------------
# Host transitions (struct-of-arrays over timesteps)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True, eq=False)
class TransitionsMinimal:
    """A batch of (obs, acts, infos) — the minimum needed for BC.

    Reference: src/imitation/data/types.py:481-577. Supports len, slicing
    (returns a new TransitionsMinimal) and integer indexing (returns a dict),
    making it directly usable as a map-style dataset.
    """

    obs: Observation
    acts: np.ndarray
    infos: np.ndarray

    def __len__(self) -> int:
        return len(self.acts)

    def __post_init__(self):
        object.__setattr__(self, "obs", maybe_wrap_in_dictobs(self.obs))
        object.__setattr__(self, "acts", np.asarray(self.acts))
        for val in [self.obs, self.acts, self.infos]:
            if hasattr(val, "setflags"):
                val.setflags(write=False)
        if _obs_len(self.obs) != len(self.acts):
            raise ValueError(
                "obs and acts must have same number of timesteps: "
                f"{_obs_len(self.obs)} != {len(self.acts)}",
            )
        if self.infos is not None and len(self.infos) != len(self.obs):
            raise ValueError(
                "obs and infos must have same number of timesteps: "
                f"{_obs_len(self.obs)} != {len(self.infos)}",
            )

    def __getitem__(self, key):
        d = dataclass_quick_asdict(self)
        d_item = {k: (v[key] if v is not None else None) for k, v in d.items()}
        if isinstance(key, slice):
            return dataclasses.replace(self, **d_item)
        assert isinstance(key, (int, np.integer, np.ndarray, list))
        if isinstance(key, (np.ndarray, list)):
            return dataclasses.replace(self, **d_item)
        d_item["obs"] = maybe_unwrap_dictobs(d_item["obs"])
        return d_item


@dataclasses.dataclass(frozen=True, eq=False)
class Transitions(TransitionsMinimal):
    """obs/acts/next_obs/dones batch (reference: data/types.py:580-621)."""

    next_obs: Observation
    dones: np.ndarray

    def __post_init__(self):
        object.__setattr__(self, "next_obs", maybe_wrap_in_dictobs(self.next_obs))
        object.__setattr__(self, "dones", np.asarray(self.dones))
        super().__post_init__()
        if _obs_len(self.next_obs) != _obs_len(self.obs):
            raise ValueError(
                "obs and next_obs must have same number of timesteps: "
                f"{_obs_len(self.obs)} != {_obs_len(self.next_obs)}",
            )
        if isinstance(self.obs, DictObs):
            if self.obs.shape != self.next_obs.shape:
                raise ValueError("obs and next_obs must have the same shape")
        else:
            if self.obs.shape != self.next_obs.shape:
                raise ValueError(
                    "obs and next_obs must have the same shape: "
                    f"{self.obs.shape} != {self.next_obs.shape}",
                )
            if self.obs.dtype != self.next_obs.dtype:
                raise ValueError(
                    "obs and next_obs must have the same dtype: "
                    f"{self.obs.dtype} != {self.next_obs.dtype}",
                )
        if self.dones.shape != (len(self.acts),):
            raise ValueError(
                f"dones must be 1D array, one entry for each timestep: "
                f"{self.dones.shape} != ({len(self.acts)},)",
            )
        if self.dones.dtype != bool:
            raise ValueError(f"dones must be boolean, not {self.dones.dtype}")


@dataclasses.dataclass(frozen=True, eq=False)
class TransitionsWithRew(Transitions):
    """Transitions with per-step rewards (reference: data/types.py:624-638)."""

    rews: np.ndarray

    def __post_init__(self):
        object.__setattr__(self, "rews", np.asarray(self.rews))
        super().__post_init__()
        if self.rews.shape != (len(self.acts),):
            raise ValueError(
                f"rewards must be 1D array, one entry for each timestep: "
                f"{self.rews.shape} != ({len(self.acts)},)",
            )
        if not np.issubdtype(self.rews.dtype, np.floating):
            raise ValueError(f"rewards dtype {self.rews.dtype} not a float")


AnyTransitions = Union[
    Iterable[AnyTrajectory],
    Iterable[Mapping[str, Any]],
    TransitionsMinimal,
]


# ---------------------------------------------------------------------------
# Device tier: fixed-shape pytree batches
# ---------------------------------------------------------------------------

ArrayTree = Any  # pytree of jnp arrays


@struct.dataclass
class TransitionBatch:
    """A device-resident batch of transitions (struct-of-arrays pytree).

    All leaves share leading dim B. ``obs`` / ``next_obs`` may be arrays or
    dict pytrees (the jit-friendly form of DictObs). ``rews`` defaults to
    zeros when the source had no rewards.

    TPU-native counterpart of the reference's `Transitions*` dataclasses —
    usable directly inside `jit`/`vmap`/`scan` and shardable over a mesh.
    """

    obs: ArrayTree
    acts: jnp.ndarray
    next_obs: ArrayTree
    dones: jnp.ndarray  # float32 {0.,1.} — float for direct math use
    rews: jnp.ndarray

    @property
    def batch_size(self) -> int:
        return self.acts.shape[0]

    def __len__(self) -> int:
        return self.batch_size

    @classmethod
    def from_host(cls, t: TransitionsMinimal) -> "TransitionBatch":
        obs = maybe_unwrap_dictobs(t.obs)
        obs = jax.tree.map(jnp.asarray, obs)
        acts = jnp.asarray(t.acts)
        if isinstance(t, Transitions):
            next_obs = jax.tree.map(jnp.asarray, maybe_unwrap_dictobs(t.next_obs))
            dones = jnp.asarray(t.dones, dtype=jnp.float32)
        else:
            next_obs = obs
            dones = jnp.zeros((len(t),), dtype=jnp.float32)
        if isinstance(t, TransitionsWithRew):
            rews = jnp.asarray(t.rews, dtype=jnp.float32)
        else:
            rews = jnp.zeros((len(t),), dtype=jnp.float32)
        return cls(obs=obs, acts=acts, next_obs=next_obs, dones=dones, rews=rews)

    def take(self, idx: jnp.ndarray) -> "TransitionBatch":
        return jax.tree.map(lambda x: x[idx], self)


@struct.dataclass
class TrajectoryBatch:
    """Padded batch of trajectories, fixed shape ``[B, T(+1), ...]``.

    The device-native representation of a list of variable-length episodes:
    ``obs[b, :lengths[b]+1]`` are valid, ``acts[b, :lengths[b]]`` are valid,
    the rest is padding. ``mask[b, t] = t < lengths[b]`` (float32).
    """

    obs: ArrayTree  # [B, T+1, ...]
    acts: jnp.ndarray  # [B, T, ...]
    rews: jnp.ndarray  # [B, T]
    lengths: jnp.ndarray  # [B] int32
    terminal: jnp.ndarray  # [B] bool — True if episode hit a terminal state

    @property
    def max_length(self) -> int:
        return self.acts.shape[1]

    @property
    def batch_size(self) -> int:
        return self.acts.shape[0]

    @property
    def mask(self) -> jnp.ndarray:
        t = jnp.arange(self.max_length)[None, :]
        return (t < self.lengths[:, None]).astype(jnp.float32)

    @classmethod
    def from_host(
        cls,
        trajs: Sequence[AnyTrajectory],
        max_length: Optional[int] = None,
    ) -> "TrajectoryBatch":
        if not trajs:
            raise ValueError("empty trajectory list")
        lengths = np.array([len(t) for t in trajs], dtype=np.int32)
        T = int(max_length if max_length is not None else lengths.max())
        if lengths.max() > T:
            raise ValueError(f"trajectory longer than max_length: {lengths.max()} > {T}")
        B = len(trajs)

        def pad_stack(arrays, total):
            out = np.zeros((B, total) + np.asarray(arrays[0]).shape[1:], np.asarray(arrays[0]).dtype)
            for i, a in enumerate(arrays):
                out[i, : len(a)] = a
                # repeat last frame into padding so padded obs are in-distribution
                if len(a) < total:
                    out[i, len(a):] = a[-1]
            return out

        obs0 = trajs[0].obs
        if isinstance(obs0, DictObs):
            obs = {
                k: pad_stack([t.obs.get(k) for t in trajs], T + 1)
                for k in obs0.keys()
            }
        else:
            obs = pad_stack([np.asarray(t.obs) for t in trajs], T + 1)
        acts = pad_stack([t.acts for t in trajs], T)
        if isinstance(trajs[0], TrajectoryWithRew):
            rews = pad_stack([t.rews for t in trajs], T).astype(np.float32)
        else:
            rews = np.zeros((B, T), np.float32)
        terminal = np.array([t.terminal for t in trajs], dtype=bool)
        return cls(
            obs=jax.tree.map(jnp.asarray, obs),
            acts=jnp.asarray(acts),
            rews=jnp.asarray(rews * (np.arange(T)[None] < lengths[:, None])),
            lengths=jnp.asarray(lengths),
            terminal=jnp.asarray(terminal),
        )

    def flatten(self) -> TransitionBatch:
        """Flattens valid timesteps into a TransitionBatch (device-side).

        Equivalent of the reference's ``flatten_trajectories``
        (reference: src/imitation/data/rollout.py:563-610) but producing a
        fixed-shape batch: padding steps are retained with zero mask-weight
        removed by boolean gather on host, or kept + masked on device. Here we
        gather on host since flatten is a data-prep step, not a hot loop.
        """
        mask = np.asarray(self.mask).astype(bool)  # [B, T]
        idx_b, idx_t = np.nonzero(mask)
        obs = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[idx_b, idx_t]), self.obs)
        next_obs = jax.tree.map(
            lambda x: jnp.asarray(np.asarray(x)[idx_b, idx_t + 1]), self.obs
        )
        acts = jnp.asarray(np.asarray(self.acts)[idx_b, idx_t])
        rews = jnp.asarray(np.asarray(self.rews)[idx_b, idx_t])
        lengths = np.asarray(self.lengths)
        terminal = np.asarray(self.terminal)
        dones = (idx_t == lengths[idx_b] - 1) & terminal[idx_b]
        return TransitionBatch(
            obs=obs,
            acts=acts,
            next_obs=next_obs,
            dones=jnp.asarray(dones, dtype=jnp.float32),
            rews=rews,
        )


# ---------------------------------------------------------------------------
# Conversion + misc
# ---------------------------------------------------------------------------


def transitions_collate_fn(batch: Sequence[Mapping[str, Any]]) -> Dict[str, Any]:
    """Collates a list of timestep dicts into a batched dict.

    Reference: src/imitation/data/types.py:447-478 (torch collate); here plain
    numpy stacking, with infos kept as a list.
    """
    result = {}
    keys = batch[0].keys()
    for k in keys:
        vals = [b[k] for b in batch]
        if k == "infos":
            result[k] = list(vals)
        elif isinstance(vals[0], (dict, Mapping)):
            result[k] = {kk: np.stack([v[kk] for v in vals]) for kk in vals[0]}
        else:
            result[k] = np.stack([np.asarray(v) for v in vals])
    return result

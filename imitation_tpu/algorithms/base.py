"""Algorithm base classes and demonstration handling.

Counterpart of reference ``algorithms/base.py``:

* ``BaseImitationAlgorithm`` — logger injection and the **fixed-horizon
  safety check** (reference base.py:77-110): variable-length episodes leak
  reward information through termination, so algorithms refuse them unless
  ``allow_variable_horizon=True``.
* ``DemonstrationAlgorithm`` — ``set_demonstrations`` / ``policy`` interface
  (reference base.py:132-182).
* ``DemonstrationStore`` — the TPU-native replacement for
  ``make_data_loader`` (reference base.py:226-288): demonstrations are
  normalized once into a device-resident ``TransitionBatch`` plus an
  epoch-shuffled minibatch index stream generated with jax PRNG, so training
  steps gather minibatches from HBM instead of pulling from a host
  DataLoader.
"""

from __future__ import annotations

import abc
import dataclasses
from typing import Any, Iterable, Iterator, Mapping, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from imitation_tpu.data import rollout as rollout_mod
from imitation_tpu.data import types
from imitation_tpu.util.logger import HierarchicalLogger, configure

AnyDemonstrations = Union[
    Sequence[types.AnyTrajectory],
    types.TransitionsMinimal,
    types.TransitionBatch,
    Iterable[Mapping[str, np.ndarray]],
]


class BaseImitationAlgorithm(abc.ABC):
    """Base for all algorithms (reference base.py:24-129)."""

    allow_variable_horizon: bool

    def __init__(
        self,
        *,
        custom_logger: Optional[HierarchicalLogger] = None,
        allow_variable_horizon: bool = False,
    ):
        self._logger = custom_logger or configure()
        self.allow_variable_horizon = allow_variable_horizon
        if allow_variable_horizon:
            self.logger.warn(
                "Running with `allow_variable_horizon` set to True. "
                "Some algorithms are biased towards shorter or longer "
                "episodes, which may significantly confound results. "
                "Additionally, even unbiased algorithms can exploit "
                "the information leak from the termination condition.",
            )
        self._horizon: Optional[int] = None

    @property
    def logger(self) -> HierarchicalLogger:
        return self._logger

    @logger.setter
    def logger(self, value: HierarchicalLogger) -> None:
        self._logger = value

    def _check_fixed_horizon(self, horizons: Iterable[int]) -> None:
        """Raises if episodes of varying length detected (reference base.py:77-110)."""
        if self.allow_variable_horizon:
            return
        horizons = set(horizons)
        if self._horizon is not None:
            horizons.add(self._horizon)
        if len(horizons) > 1:
            raise ValueError(
                f"Episodes of different length detected: {sorted(horizons)}. "
                "Variable horizon environments are discouraged -- "
                "termination conditions leak information about reward. See "
                "https://imitation.readthedocs.io/en/latest/guide/variable_horizon.html "
                "for more information. If you are SURE you want to run "
                "imitation learning in a variable horizon setting, then please "
                "pass in the flag: `allow_variable_horizon=True`.",
            )
        elif len(horizons) == 1:
            self._horizon = horizons.pop()

    def __getstate__(self):
        state = self.__dict__.copy()
        del state["_logger"]
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._logger = configure()


class DemonstrationAlgorithm(BaseImitationAlgorithm):
    """Algorithm trained from demonstrations (reference base.py:132-182)."""

    def __init__(
        self,
        *,
        demonstrations: Optional[AnyDemonstrations] = None,
        custom_logger: Optional[HierarchicalLogger] = None,
        allow_variable_horizon: bool = False,
    ):
        super().__init__(
            custom_logger=custom_logger,
            allow_variable_horizon=allow_variable_horizon,
        )
        if demonstrations is not None:
            self.set_demonstrations(demonstrations)

    @abc.abstractmethod
    def set_demonstrations(self, demonstrations: AnyDemonstrations) -> None:
        ...

    @property
    @abc.abstractmethod
    def policy(self):
        """The imitation policy produced by training."""


def demonstrations_to_batch(demonstrations: AnyDemonstrations) -> types.TransitionBatch:
    """Normalizes any accepted demonstration format to a device batch.

    Accepts the same formats as the reference's ``make_data_loader``
    (reference base.py:226-288): sequence of trajectories, Transitions*
    instances, iterables of batch dicts — plus already-device batches.
    """
    if isinstance(demonstrations, types.TransitionBatch):
        return demonstrations
    if isinstance(demonstrations, types.TransitionsMinimal):
        return types.TransitionBatch.from_host(demonstrations)
    if isinstance(demonstrations, Iterable):
        items = list(demonstrations)
        if not items:
            raise ValueError("Empty demonstrations.")
        if isinstance(items[0], types.Trajectory):
            flat = rollout_mod.flatten_trajectories(items)
            return types.TransitionBatch.from_host(flat)
        if isinstance(items[0], Mapping):
            # iterable of batch dicts with obs/acts (duck-typed DataLoader)
            obs = np.concatenate([np.asarray(b["obs"]) for b in items])
            acts = np.concatenate([np.asarray(b["acts"]) for b in items])
            d = {"obs": obs, "acts": acts}
            for k in ("next_obs", "dones", "rews"):
                if k in items[0]:
                    d[k] = np.concatenate([np.asarray(b[k]) for b in items])
            tb = types.TransitionBatch(
                obs=jnp.asarray(d["obs"]),
                acts=jnp.asarray(d["acts"]),
                next_obs=jnp.asarray(d.get("next_obs", d["obs"])),
                dones=jnp.asarray(
                    d.get("dones", np.zeros(len(obs))), dtype=jnp.float32
                ),
                rews=jnp.asarray(
                    d.get("rews", np.zeros(len(obs))), dtype=jnp.float32
                ),
            )
            return tb
    raise TypeError(f"`demonstrations` unsupported type: {type(demonstrations)}")


@dataclasses.dataclass
class DemonstrationStore:
    """Device-resident demonstrations + epoch-shuffled minibatch streams."""

    batch: types.TransitionBatch

    @classmethod
    def from_demonstrations(cls, demonstrations: AnyDemonstrations) -> "DemonstrationStore":
        return cls(batch=demonstrations_to_batch(demonstrations))

    @property
    def num_samples(self) -> int:
        return self.batch.batch_size

    def epoch_indices(
        self, key: jax.Array, batch_size: int, drop_last: bool = True
    ) -> jnp.ndarray:
        """[n_batches, batch_size] shuffled index matrix for one epoch."""
        n = self.num_samples
        if batch_size > n:
            raise ValueError(
                f"batch_size={batch_size} larger than dataset size {n}"
            )
        perm = jax.random.permutation(key, n)
        n_batches = n // batch_size
        if not drop_last and n % batch_size != 0:
            # pad the final ragged batch by wrapping around
            pad = (n_batches + 1) * batch_size - n
            perm = jnp.concatenate([perm, perm[:pad]])
            n_batches += 1
        return perm[: n_batches * batch_size].reshape(n_batches, batch_size)

    def sample(self, key: jax.Array, batch_size: int) -> types.TransitionBatch:
        """Uniform with-replacement minibatch (for endless iteration)."""
        idx = jax.random.randint(key, (batch_size,), 0, self.num_samples)
        return self.batch.take(idx)

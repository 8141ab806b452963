"""Policy classes (re-exports + non-trainable policies).

Counterpart of reference ``policies/base.py`` (150 LoC): the concrete policy
networks live in ``models/policies.py``; this module provides the reference
module layout plus ``NonTrainablePolicy`` for host-side per-observation
policies (e.g. interactive/human policies) and ``NormalizeFeaturesExtractor``
semantics (available as ``ActorCriticPolicy(normalize_features=True)``,
reference policies/base.py:123-150).
"""

from __future__ import annotations

import abc
from typing import Any, Tuple

import jax
import numpy as np

from imitation_tpu.envs.base import Space
from imitation_tpu.models.policies import (  # noqa: F401  (re-exports)
    ActorCriticPolicy,
    FeedForward32Policy,
    RandomPolicy,
    ZeroPolicy,
)


def SAC1024Policy(observation_space: Space, action_space: Space, **kwargs):
    """Actor-critic with a 1024-wide torso — PEBBLE-style default for
    entropy-based RLHF pretraining (reference policies/base.py:107-121).
    For the SAC learner itself use rl/sac.py with
    ``actor_hid_sizes=(1024,)``."""
    return ActorCriticPolicy(
        observation_space=observation_space,
        action_space=action_space,
        hid_sizes=(1024,),
        **kwargs,
    )


class NonTrainablePolicy(abc.ABC):
    """Host-side policy choosing actions per observation
    (reference policies/base.py:17-57). Not jit-able: used for interactive /
    hard-coded policies on the gym-bridge path; ``as_rollout_fn`` adapts it
    to the rollout interface via per-batch host callback."""

    def __init__(self, observation_space: Space, action_space: Space):
        self.observation_space = observation_space
        self.action_space = action_space

    @abc.abstractmethod
    def _choose_action(self, obs: np.ndarray):
        ...

    def predict(self, obs: np.ndarray, deterministic: bool = False) -> np.ndarray:
        return np.stack([np.asarray(self._choose_action(o)) for o in np.asarray(obs)])

    def as_rollout_fn(self):
        """(params, obs, key) -> (acts, {}) using a host callback."""
        import jax.numpy as jnp

        def f(params, obs, key):
            acts = jax.pure_callback(
                lambda o: self.predict(np.asarray(o)).astype(
                    np.int32 if self.action_space.is_discrete else np.float32
                ),
                jax.ShapeDtypeStruct(
                    (jax.tree.leaves(obs)[0].shape[0],) + self.action_space.shape,
                    jnp.int32 if self.action_space.is_discrete else jnp.float32,
                ),
                obs,
            )
            return acts, {}

        return f

"""Policy networks and the policy interface.

TPU-native counterpart of the reference's ``policies/base.py`` + SB3's
ActorCriticPolicy stack. A policy here is a pair (module definition, params
pytree) with pure functions:

* ``distribution(params, obs)`` — action distribution at obs.
* ``value(params, obs)`` — state-value estimate (actor-critic policies).
* ``sample_fn()`` / ``deterministic_fn()`` — rollout-ready
  ``(params, obs, key) -> (acts, aux)`` closures for the rollout scan.

Provided policies:

* ``ActorCriticPolicy`` — separate MLP torsos for pi and vf, 32x32 default
  (the reference's ``FeedForward32Policy``, policies/base.py:92-105).
* ``SACPolicy`` torso sizes 1024x... live in rl/sac.py.
* ``RandomPolicy`` / ``ZeroPolicy`` — non-trainable baselines
  (reference policies/base.py:60-90).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple, Type

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from imitation_tpu.envs.base import Space
from imitation_tpu.models import networks
from imitation_tpu.models.distributions import Categorical, DiagGaussian


class ActorCriticNet(nn.Module):
    """Shared-input actor-critic with separate pi/vf MLP torsos.

    Equivalent of SB3's ``ActorCriticPolicy(net_arch=[32, 32])`` used by the
    reference as ``FeedForward32Policy`` (reference: policies/base.py:92-105).
    Continuous actions use a state-independent learned log_std (SB3 default).
    """

    action_space: Space
    hid_sizes: Sequence[int] = (32, 32)
    activation: Callable = nn.tanh
    normalize_features: bool = False
    log_std_init: float = 0.0
    compute_dtype: Any = jnp.float32
    # "flatten" (default MLP input) or "nature_cnn" (SB3 CnnPolicy's
    # NatureCNN: 8x8s4x32 / 4x4s2x64 / 3x3s1x64 convs + dense 512, for
    # [B, H, W, C] image observations scaled from uint8).
    features: str = "flatten"

    @nn.compact
    def __call__(self, obs, *, update_stats: bool = False):
        if self.features == "nature_cnn" and not isinstance(obs, dict):
            x = obs.astype(self.compute_dtype)
            if x.ndim == 3:
                x = x[..., None]
            x = x / 255.0
            for ch, k, s in ((32, 8, 4), (64, 4, 2), (64, 3, 1)):
                x = nn.relu(
                    nn.Conv(
                        ch, (k, k), strides=(s, s), padding="VALID",
                        dtype=self.compute_dtype, name=f"conv{ch}_{k}",
                    )(x)
                )
            x = x.reshape((x.shape[0], -1))
            x = nn.relu(nn.Dense(512, dtype=self.compute_dtype, name="cnn_fc")(x))
        elif isinstance(obs, dict):
            # Dict observations: flatten + concat leaves in sorted key order
            # (the reference's CombinedExtractor, used for DictObs policies).
            parts = [
                obs[k].reshape((obs[k].shape[0], -1)).astype(self.compute_dtype)
                for k in sorted(obs.keys())
            ]
            x = jnp.concatenate(parts, axis=-1)
        else:
            x = obs.reshape((obs.shape[0], -1)).astype(self.compute_dtype)
        if self.normalize_features:
            # NormalizeFeaturesExtractor equivalent (reference policies/base.py:123-150)
            x = networks.RunningNorm(num_features=x.shape[-1], name="feat_norm")(
                x, update_stats=update_stats
            )
        pi_x, vf_x = x, x
        for i, h in enumerate(self.hid_sizes):
            pi_x = self.activation(nn.Dense(h, dtype=self.compute_dtype, name=f"pi{i}")(pi_x))
            vf_x = self.activation(nn.Dense(h, dtype=self.compute_dtype, name=f"vf{i}")(vf_x))
        value = nn.Dense(1, dtype=self.compute_dtype, name="vf_out")(vf_x)
        value = value.astype(jnp.float32).squeeze(-1)
        if self.action_space.is_discrete:
            logits = nn.Dense(
                self.action_space.n, dtype=self.compute_dtype, name="pi_out"
            )(pi_x).astype(jnp.float32)
            dist = Categorical(logits=logits)
        else:
            act_dim = self.action_space.flat_dim
            mean = nn.Dense(act_dim, dtype=self.compute_dtype, name="pi_out")(
                pi_x
            ).astype(jnp.float32)
            log_std = self.param(
                "log_std", lambda k: jnp.full((act_dim,), self.log_std_init, jnp.float32)
            )
            dist = DiagGaussian(mean=mean, log_std=log_std)
        return dist, value


@dataclasses.dataclass
class ActorCriticPolicy:
    """Bundles an ActorCriticNet definition with pure apply helpers.

    ``variables`` passed to the helpers is the full flax variables dict
    ({"params": ..., "stats": ...}); stats updates are only taken in
    dedicated update passes, keeping rollout applies read-only.
    """

    observation_space: Space
    action_space: Space
    hid_sizes: Sequence[int] = (32, 32)
    activation: Callable = nn.tanh
    normalize_features: bool = False
    log_std_init: float = 0.0
    features: str = "flatten"  # "flatten" | "nature_cnn" (CnnPolicy equiv)

    def __post_init__(self):
        self.net = ActorCriticNet(
            action_space=self.action_space,
            hid_sizes=tuple(self.hid_sizes),
            activation=self.activation,
            normalize_features=self.normalize_features,
            log_std_init=self.log_std_init,
            features=self.features,
        )

    # -- init --------------------------------------------------------------
    def init(self, key: jax.Array):
        space = self.observation_space
        if hasattr(space, "spaces"):  # DictSpace
            dummy = {
                k: jnp.zeros((1,) + s.shape, jnp.float32)
                for k, s in space.spaces.items()
            }
        else:
            dummy = jnp.zeros((1,) + space.shape, jnp.float32)
        return self.net.init(key, dummy)

    # -- pure applies ------------------------------------------------------
    def distribution(self, variables, obs):
        dist, _ = self.net.apply(variables, obs)
        return dist

    def value(self, variables, obs) -> jnp.ndarray:
        _, v = self.net.apply(variables, obs)
        return v

    def dist_and_value(self, variables, obs):
        return self.net.apply(variables, obs)

    def _format_act(self, act: jnp.ndarray) -> jnp.ndarray:
        if self.action_space.is_discrete:
            return act.astype(jnp.int32)
        return act.reshape((-1,) + self.action_space.shape)

    def sample_fn(self):
        """(variables, obs, key) -> (acts, {log_prob, value}) for rollout.

        The closure is cached on the policy so repeated callers (e.g.
        periodic evals) get a stable function identity — downstream
        ``jax.jit`` / collector caches key on it.
        """
        f = getattr(self, "_sample_fn_cache", None)
        if f is not None:
            return f

        def f(variables, obs, key):
            dist, value = self.net.apply(variables, obs)
            acts = dist.sample(key)
            lp = dist.log_prob(acts)
            return self._format_act(acts), {"log_prob": lp, "value": value}

        object.__setattr__(self, "_sample_fn_cache", f)
        return f

    def deterministic_fn(self):
        f = getattr(self, "_det_fn_cache", None)
        if f is not None:
            return f

        def f(variables, obs, key):
            dist, value = self.net.apply(variables, obs)
            acts = dist.mode()
            lp = dist.log_prob(acts)
            return self._format_act(acts), {"log_prob": lp, "value": value}

        object.__setattr__(self, "_det_fn_cache", f)
        return f

    def predict(
        self,
        variables,
        obs,
        deterministic: bool = False,
        seed: int = 0,
    ) -> np.ndarray:
        """SB3-style host prediction: numpy obs in, numpy actions out."""
        import numpy as _np

        obs_j = jax.tree.map(jnp.asarray, obs)
        single = (
            not isinstance(obs_j, dict)
            and obs_j.ndim == len(self.observation_space.shape)
        )
        if single:
            obs_j = jax.tree.map(lambda x: x[None], obs_j)
        fn = self.deterministic_fn() if deterministic else self.sample_fn()
        acts, _ = fn(variables, obs_j, jax.random.key(seed))
        acts = _np.asarray(acts)
        return acts[0] if single else acts

    def evaluate_actions(self, variables, obs, acts, *, update_stats: bool = False):
        """Returns (log_prob, entropy, value) — SB3 ``evaluate_actions``."""
        if update_stats:
            (dist, value), mutated = self.net.apply(
                variables, obs, update_stats=True, mutable=["stats"]
            )
        else:
            dist, value = self.net.apply(variables, obs)
            mutated = None
        if self.action_space.is_discrete:
            acts_in = acts.astype(jnp.int32)
        else:
            acts_in = acts.reshape((acts.shape[0], -1))
        lp = dist.log_prob(acts_in)
        ent = dist.entropy()
        return (lp, ent, value) if mutated is None else (lp, ent, value, mutated)


def FeedForward32Policy(observation_space: Space, action_space: Space, **kwargs):
    """Factory matching the reference's FeedForward32Policy (base.py:92-105)."""
    return ActorCriticPolicy(
        observation_space=observation_space,
        action_space=action_space,
        hid_sizes=(32, 32),
        **kwargs,
    )


# ---------------------------------------------------------------------------
# Non-trainable policies (reference policies/base.py:17-90)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class RandomPolicy:
    """Uniform-random actions."""

    observation_space: Space
    action_space: Space

    def init(self, key):
        return {}

    def sample_fn(self):
        space = self.action_space

        def f(variables, obs, key):
            batch = jax.tree.leaves(obs)[0].shape[0]
            keys = jax.random.split(key, batch)
            acts = jax.vmap(space.sample)(keys)
            return acts, {}

        return f

    deterministic_fn = sample_fn


@dataclasses.dataclass
class ZeroPolicy:
    """All-zero actions."""

    observation_space: Space
    action_space: Space

    def init(self, key):
        return {}

    def sample_fn(self):
        space = self.action_space

        def f(variables, obs, key):
            batch = jax.tree.leaves(obs)[0].shape[0]
            dtype = jnp.int32 if space.is_discrete else jnp.float32
            acts = jnp.zeros((batch,) + space.shape, dtype)
            return acts, {}

        return f

    deterministic_fn = sample_fn

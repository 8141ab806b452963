"""Minimal action-distribution library (pure JAX).

The reference relies on SB3/torch distributions (Categorical, DiagGaussian,
SquashedGaussian) inside its policies. These are small, closed-form objects —
re-implemented here as immutable pytrees with vectorized log_prob / sample /
entropy so they trace cleanly and fuse into surrounding XLA programs.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

_LOG_2PI = math.log(2.0 * math.pi)


@struct.dataclass
class Categorical:
    """Categorical over the last axis of ``logits``."""

    logits: jnp.ndarray  # [..., n]

    @property
    def log_probs_all(self) -> jnp.ndarray:
        return jax.nn.log_softmax(self.logits, axis=-1)

    def log_prob(self, actions: jnp.ndarray) -> jnp.ndarray:
        lp = self.log_probs_all
        return jnp.take_along_axis(lp, actions[..., None].astype(jnp.int32), axis=-1)[..., 0]

    def sample(self, key: jax.Array) -> jnp.ndarray:
        return jax.random.categorical(key, self.logits, axis=-1)

    def mode(self) -> jnp.ndarray:
        return jnp.argmax(self.logits, axis=-1)

    def entropy(self) -> jnp.ndarray:
        lp = self.log_probs_all
        p = jnp.exp(lp)
        return -jnp.sum(p * lp, axis=-1)

    def kl(self, other: "Categorical") -> jnp.ndarray:
        lp, lq = self.log_probs_all, other.log_probs_all
        return jnp.sum(jnp.exp(lp) * (lp - lq), axis=-1)


@struct.dataclass
class DiagGaussian:
    """Diagonal Gaussian; log_prob sums over the last (action-dim) axis."""

    mean: jnp.ndarray  # [..., d]
    log_std: jnp.ndarray  # [..., d] or [d] (state-independent, SB3-style)

    def _lstd(self) -> jnp.ndarray:
        return jnp.broadcast_to(self.log_std, self.mean.shape)

    def log_prob(self, actions: jnp.ndarray) -> jnp.ndarray:
        lstd = self._lstd()
        z = (actions - self.mean) * jnp.exp(-lstd)
        per_dim = -0.5 * (z**2 + _LOG_2PI) - lstd
        return jnp.sum(per_dim, axis=-1)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        eps = jax.random.normal(key, self.mean.shape, dtype=self.mean.dtype)
        return self.mean + eps * jnp.exp(self._lstd())

    def mode(self) -> jnp.ndarray:
        return self.mean

    def entropy(self) -> jnp.ndarray:
        lstd = self._lstd()
        return jnp.sum(0.5 * (1.0 + _LOG_2PI) + lstd, axis=-1)


@struct.dataclass
class SquashedGaussian:
    """tanh-squashed diagonal Gaussian (SAC). Actions in (-1, 1).

    ``sample_and_log_prob`` applies the tanh change-of-variables correction
    in a numerically stable softplus form.
    """

    mean: jnp.ndarray
    log_std: jnp.ndarray

    def sample_and_log_prob(self, key: jax.Array) -> Tuple[jnp.ndarray, jnp.ndarray]:
        lstd = jnp.broadcast_to(self.log_std, self.mean.shape)
        eps = jax.random.normal(key, self.mean.shape, dtype=self.mean.dtype)
        pre = self.mean + eps * jnp.exp(lstd)
        act = jnp.tanh(pre)
        base_lp = jnp.sum(-0.5 * (eps**2 + _LOG_2PI) - lstd, axis=-1)
        # log|d tanh/dx| = log(1 - tanh^2 x) = 2*(log2 - x - softplus(-2x))
        correction = jnp.sum(
            2.0 * (math.log(2.0) - pre - jax.nn.softplus(-2.0 * pre)), axis=-1
        )
        return act, base_lp - correction

    def log_prob(self, actions: jnp.ndarray) -> jnp.ndarray:
        act = jnp.clip(actions, -1.0 + 1e-6, 1.0 - 1e-6)
        pre = jnp.arctanh(act)
        lstd = jnp.broadcast_to(self.log_std, self.mean.shape)
        z = (pre - self.mean) * jnp.exp(-lstd)
        base_lp = jnp.sum(-0.5 * (z**2 + _LOG_2PI) - lstd, axis=-1)
        correction = jnp.sum(
            2.0 * (math.log(2.0) - pre - jax.nn.softplus(-2.0 * pre)), axis=-1
        )
        return base_lp - correction

    def mode(self) -> jnp.ndarray:
        return jnp.tanh(self.mean)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        act, _ = self.sample_and_log_prob(key)
        return act

"""Generalized Advantage Estimation as a parallel (associative) scan.

The reference delegates GAE to SB3's python loop over timesteps
(stable_baselines3 RolloutBuffer.compute_returns_and_advantage — a reverse
Python for-loop on CPU). On TPU the recurrence

    A_t = delta_t + gamma * lam * (1 - done_t) * A_{t+1}

is a first-order linear recurrence, i.e. a composition of affine maps — so we
evaluate it in O(log T) depth with ``jax.lax.associative_scan`` over the time
axis, fully vectorized over envs on the VPU. Truncation is handled exactly:
``delta_t`` uses V(next_obs_t) where next_obs is the *true* next observation
(terminal_observation at episode ends), so time-limit bootstrapping needs no
special-casing (cf. SB3's episode-start bookkeeping).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def gae(
    rews: jnp.ndarray,  # [T, B]
    values: jnp.ndarray,  # [T, B]   V(obs_t)
    next_values: jnp.ndarray,  # [T, B]   V(next_obs_t)
    terminated: jnp.ndarray,  # [T, B]   true terminal (no bootstrap)
    dones: jnp.ndarray,  # [T, B]   terminated | truncated (recurrence reset)
    gamma: float,
    lam: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (advantages, returns), both [T, B].

    ``returns = advantages + values`` (the lambda-return value target).
    """
    terminated = terminated.astype(rews.dtype)
    dones = dones.astype(rews.dtype)
    deltas = rews + gamma * next_values * (1.0 - terminated) - values
    mult = gamma * lam * (1.0 - dones)

    # Reverse time so the backward recurrence becomes a forward prefix scan of
    # affine maps y -> d + m*y; compose with op(earlier, later) = later∘earlier.
    d_rev = deltas[::-1]
    m_rev = mult[::-1]

    def combine(earlier, later):
        m_e, d_e = earlier
        m_l, d_l = later
        return m_l * m_e, d_l + m_l * d_e

    _, adv_rev = jax.lax.associative_scan(combine, (m_rev, d_rev), axis=0)
    advantages = adv_rev[::-1]
    return advantages, advantages + values


def discounted_returns(
    rews: jnp.ndarray,  # [T, B]
    dones: jnp.ndarray,  # [T, B]
    gamma: float,
    bootstrap: jnp.ndarray = None,  # [B] value after the last step
    terminated_last: jnp.ndarray = None,  # [B]
) -> jnp.ndarray:
    """Per-step discounted returns-to-go via the same associative scan."""
    dones = dones.astype(rews.dtype)
    r = rews
    if bootstrap is not None:
        last = r[-1] + gamma * bootstrap * (
            1.0 - (terminated_last.astype(r.dtype) if terminated_last is not None else 0.0)
        )
        r = r.at[-1].set(last)
    mult = gamma * (1.0 - dones)
    d_rev = r[::-1]
    m_rev = mult[::-1]

    def combine(earlier, later):
        m_e, d_e = earlier
        m_l, d_l = later
        return m_l * m_e, d_l + m_l * d_e

    _, ret_rev = jax.lax.associative_scan(combine, (m_rev, d_rev), axis=0)
    return ret_rev[::-1]

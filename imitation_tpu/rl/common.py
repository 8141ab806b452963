"""Shared RL infrastructure: train states, schedules, the algorithm protocol.

This layer replaces Stable Baselines 3 as used by the reference
(reference: src/imitation/scripts/ingredients/rl.py:122-196 constructs SB3
PPO/SAC/DQN as the "generator" of every algorithm). Here an RL algorithm is a
pytree ``state`` plus pure jitted transition functions; the host loop only
orchestrates and logs.

Design rules:
* All rollout + update work happens inside one jitted ``train_step``; the
  host sees only scalar metrics.
* Learned-reward injection (the reference's ``RewardVecEnvWrapper`` /
  ``ReplayBufferRewardWrapper``) is a function argument to ``train_step``, so
  adversarial/RLHF training fuses reward relabeling into the same XLA program
  as rollout and policy update.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from imitation_tpu.envs.vector import VecEnvState

# Relabeling reward function over a batch of transitions:
# (reward_params, obs, acts, next_obs, dones) -> rews. ``reward_params`` may be
# any pytree (e.g. reward-net variables); pass None for ground-truth reward.
RelabelRewardFn = Callable[[Any, Any, jnp.ndarray, Any, jnp.ndarray], jnp.ndarray]


@struct.dataclass
class RewNormState:
    """Running statistics for reward normalization (SB3 VecNormalize
    equivalent, used by reference train_rl's normalize_reward option,
    scripts/train_rl.py:117-127)."""

    ret: jnp.ndarray  # [B] discounted return accumulator
    var: jnp.ndarray  # scalar running variance of returns
    mean: jnp.ndarray  # scalar running mean of returns
    count: jnp.ndarray  # scalar sample count


@struct.dataclass
class RLState:
    """Common carried state for on-policy learners."""

    variables: Any  # policy variables ({"params": ..., possibly "stats": ...})
    opt_state: Any
    env_state: VecEnvState
    key: jax.Array
    timesteps: jnp.ndarray  # int32 total env steps taken (host loop tracks long runs)
    n_updates: jnp.ndarray  # int32
    reward_norm: Any = None  # Optional[RewNormState]


def global_norm(tree) -> jnp.ndarray:
    return optax.global_norm(tree)


def make_optimizer(
    learning_rate: float,
    max_grad_norm: Optional[float] = None,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    tx = []
    if max_grad_norm is not None:
        tx.append(optax.clip_by_global_norm(max_grad_norm))
    if weight_decay > 0:
        tx.append(optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay))
    else:
        tx.append(optax.adam(learning_rate, b1=b1, b2=b2, eps=eps))
    return optax.chain(*tx)


def explained_variance(y_pred: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
    var_y = jnp.var(y_true)
    return 1.0 - jnp.var(y_true - y_pred) / (var_y + 1e-8)

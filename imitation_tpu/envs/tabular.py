"""Tabular model-based MDPs for MCE IRL.

Counterpart of seals' ``TabularModelPOMDP`` which the reference's MCE IRL
requires (reference algorithms/mce_irl.py — transition/observation/reward
matrices, horizon, initial state distribution). Everything is dense arrays,
so value iteration / occupancy computation are pure matrix programs.

Also steppable through the standard Env interface (obs = observation-matrix
row of the current state) so tabular policies can be rolled out with the
same machinery as any other env.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from imitation_tpu.envs.base import Env, Space, TimeStep


class TabularMDP(Env):
    """Finite MDP: T[S,A,S] transitions, R[S] rewards, fixed horizon."""

    def __init__(
        self,
        transition_matrix: np.ndarray,  # [S, A, S]
        reward_matrix: np.ndarray,  # [S]
        horizon: int,
        initial_state_dist: Optional[np.ndarray] = None,  # [S]
        observation_matrix: Optional[np.ndarray] = None,  # [S, obs_dim]
    ):
        transition_matrix = np.asarray(transition_matrix, np.float32)
        S, A, S2 = transition_matrix.shape
        if S != S2:
            raise ValueError(f"transition matrix not square in states: {transition_matrix.shape}")
        if not np.allclose(transition_matrix.sum(-1), 1.0, atol=1e-5):
            raise ValueError("transition probabilities do not sum to 1")
        self.transition_matrix = transition_matrix
        self.reward_matrix = np.asarray(reward_matrix, np.float32)
        if self.reward_matrix.shape != (S,):
            raise ValueError(f"reward matrix must be [S]={S}, got {self.reward_matrix.shape}")
        self.horizon = horizon
        self.max_episode_steps = horizon
        if initial_state_dist is None:
            initial_state_dist = np.full(S, 1.0 / S, np.float32)
        self.initial_state_dist = np.asarray(initial_state_dist, np.float32)
        if observation_matrix is None:
            observation_matrix = np.eye(S, dtype=np.float32)
        self.observation_matrix = np.asarray(observation_matrix, np.float32)
        self.n_states = S
        self.n_actions = A
        self.obs_dim = self.observation_matrix.shape[1]

    @property
    def observation_space(self) -> Space:
        return Space.box(-np.inf, np.inf, (self.obs_dim,))

    @property
    def action_space(self) -> Space:
        return Space.discrete(self.n_actions)

    # -- Env interface (state = (s, t)) ------------------------------------
    def reset(self, key: jax.Array):
        s = jax.random.choice(
            key, self.n_states, p=jnp.asarray(self.initial_state_dist)
        )
        state = _TabState(s=s, t=jnp.zeros((), jnp.int32))
        return self.obs_of(state), state

    def obs_of(self, state) -> jnp.ndarray:
        return jnp.asarray(self.observation_matrix)[state.s]

    def step(self, state, action, key):
        probs = jnp.asarray(self.transition_matrix)[state.s, action]
        s_next = jax.random.choice(key, self.n_states, p=probs)
        new_state = _TabState(s=s_next, t=state.t + 1)
        reward = jnp.asarray(self.reward_matrix)[s_next]
        f = jnp.zeros((), dtype=bool)
        return new_state, TimeStep(
            obs=self.obs_of(new_state), reward=reward, terminated=f, truncated=f
        )


@struct.dataclass
class _TabState:
    s: jnp.ndarray
    t: jnp.ndarray


def random_mdp(
    n_states: int,
    n_actions: int,
    horizon: int,
    obs_dim: Optional[int] = None,
    branch_factor: int = 2,
    seed: int = 0,
) -> TabularMDP:
    """Random MDP generator (the reference tests use seals' random MDPs,
    tests/algorithms/test_mce_irl.py:70)."""
    rng = np.random.default_rng(seed)
    T = np.zeros((n_states, n_actions, n_states), np.float32)
    for s in range(n_states):
        for a in range(n_actions):
            succ = rng.choice(n_states, size=branch_factor, replace=False)
            probs = rng.dirichlet(np.ones(branch_factor))
            T[s, a, succ] = probs
    reward = rng.normal(size=n_states).astype(np.float32)
    if obs_dim is None:
        obs_mat = np.eye(n_states, dtype=np.float32)
    else:
        obs_mat = rng.normal(size=(n_states, obs_dim)).astype(np.float32)
    init = rng.dirichlet(np.ones(n_states)).astype(np.float32)
    return TabularMDP(T, reward, horizon, init, obs_mat)

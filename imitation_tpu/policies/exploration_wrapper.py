"""Exploration wrapper: mixture of policy and uniform-random actions with
Markov switching.

Counterpart of reference ``policies/exploration_wrapper.py`` (96 LoC): each
env holds a current mode (policy or random); every step, with probability
``switch_prob`` the mode is resampled (random with probability
``random_prob``). Stateless policies only (reference :12-95).

TPU-native: the per-env mode is part of the rollout scan carry, so exploring
rollouts remain a single jitted program (``collect`` below mirrors
``data/rollout.collect`` with the extended carry).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from imitation_tpu.data.rollout import RolloutChunk
from imitation_tpu.envs.vector import VecEnvState, VectorEnv


class ExplorationWrapper:
    """Markov-switching policy/random mixture."""

    def __init__(
        self,
        policy_apply,
        venv: VectorEnv,
        random_prob: float = 0.5,
        switch_prob: float = 0.5,
    ):
        if not (0 <= random_prob <= 1) or not (0 <= switch_prob <= 1):
            raise ValueError("probabilities must lie in [0, 1]")
        self.policy_apply = policy_apply
        self.venv = venv
        self.random_prob = random_prob
        self.switch_prob = switch_prob

    def initial_mode(self, key: jax.Array) -> jnp.ndarray:
        """[B] bool — True where the env starts in random mode."""
        return jax.random.uniform(key, (self.venv.num_envs,)) < self.random_prob

    def collect(
        self,
        params: Any,
        env_state: VecEnvState,
        mode_random: jnp.ndarray,
        num_steps: int,
        key: jax.Array,
    ) -> Tuple[VecEnvState, jnp.ndarray, RolloutChunk]:
        """Like rollout.collect but with persistent per-env exploration mode."""
        venv = self.venv
        space = venv.action_space
        B = venv.num_envs

        def step_fn(carry, step_key):
            env_state, mode = carry
            k_act, k_rand, k_switch, k_new = jax.random.split(step_key, 4)
            obs = env_state.obs
            pol_acts, aux = self.policy_apply(params, obs, k_act)
            rand_acts = jax.vmap(space.sample)(jax.random.split(k_rand, B))
            rand_acts = rand_acts.astype(pol_acts.dtype)
            m = mode.reshape((B,) + (1,) * (pol_acts.ndim - 1))
            acts = jnp.where(m, rand_acts, pol_acts)
            env_state, out = venv.step(env_state, acts)
            # Markov mode switching (reference exploration_wrapper.py:60-75).
            switch = jax.random.uniform(k_switch, (B,)) < self.switch_prob
            new_mode = jax.random.uniform(k_new, (B,)) < self.random_prob
            mode = jnp.where(switch, new_mode, mode)
            rec = RolloutChunk(
                obs=obs,
                acts=acts,
                rews=out.reward,
                next_obs=out.terminal_obs,
                terminated=out.terminated,
                truncated=out.truncated,
                episode_return=out.episode_return,
                episode_length=out.episode_length,
                aux={},
            )
            return (env_state, mode), rec

        keys = jax.random.split(key, num_steps)
        (env_state, mode_random), chunk = jax.lax.scan(
            step_fn, (env_state, mode_random), keys
        )
        return env_state, mode_random, chunk

    def host_policy_fn(self, seed: int = 0):
        """Stateful per-step policy callable for HOST envs.

        Same Markov-switching math as :meth:`collect`, expressed through the
        standard rollout policy interface ``(params, obs, key) -> (acts,
        aux)`` so it plugs into ``rollout.generate_trajectories`` on
        host-stepped (MuJoCo / gym-bridge) envs, where the scanned device
        path cannot run.

        The per-env mode is HOST state (numpy), and the callable is marked
        ``host_stateful`` so collectors run it eagerly instead of wrapping
        it in ``jax.jit`` — under jit the closure would only execute at
        trace time, freezing/leaking the mode (the reference's wrapper is
        likewise a stateful host object, exploration_wrapper.py:12-95). The
        returned fn is cached on the wrapper so the mode persists across
        rollout passes, and it returns empty aux (matching the device
        ``collect`` path; the policy's log-probs would not describe the
        substituted random actions).
        """
        cached = getattr(self, "_host_fn_cache", None)
        if cached is not None:
            return cached

        import numpy as np

        space = self.venv.action_space
        B = self.venv.num_envs
        state = {"mode": None}
        host_rng = np.random.default_rng(seed)
        def _sample(params, obs, key):
            k_act, k_rand = jax.random.split(key)
            pol_acts, _ = self.policy_apply(params, obs, k_act)
            rand_acts = jax.vmap(space.sample)(jax.random.split(k_rand, B))
            return pol_acts, rand_acts

        sample_acts = jax.jit(_sample)

        def f(params, obs, key):
            pol_acts, rand_acts = jax.device_get(sample_acts(params, obs, key))
            pol_acts = np.asarray(pol_acts)
            rand_acts = np.asarray(rand_acts).astype(pol_acts.dtype)
            if state["mode"] is None:
                state["mode"] = host_rng.random(B) < self.random_prob
            m = state["mode"].reshape((B,) + (1,) * (pol_acts.ndim - 1))
            acts = np.where(m, rand_acts, pol_acts)
            switch = host_rng.random(B) < self.switch_prob
            new_mode = host_rng.random(B) < self.random_prob
            state["mode"] = np.where(switch, new_mode, state["mode"])
            return acts, {}

        f.host_stateful = True
        self._host_fn_cache = f
        return f

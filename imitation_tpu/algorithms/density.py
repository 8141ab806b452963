"""Density-based reward modeling via kernel density estimation.

Counterpart of reference ``algorithms/density.py`` (423 LoC,
``DensityAlgorithm``): fit a KDE on flattened demonstration (s) / (s,a) /
(s,s') vectors, use log-density as the reward, and train any RL algorithm on
the relabeled environment.

TPU-native: the reference scores rewards with sklearn's KernelDensity in a
**per-sample Python loop** (reference density.py:337-358). Here the Gaussian
KDE is a closed-form batched kernel:

    log p(x) = logsumexp_i( -||x - d_i||^2 / (2 h^2) ) - log(N) - (d/2) log(2 pi h^2)

with the pairwise squared distances computed as one [B, N] matmul expansion —
exactly the shape the MXU wants — and fused into the PPO rollout relabeling,
so density scoring never leaves the device.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from imitation_tpu.algorithms import base
from imitation_tpu.data import rollout as rollout_mod
from imitation_tpu.data import types
from imitation_tpu.envs.vector import VectorEnv
from imitation_tpu.models.policies import ActorCriticPolicy
from imitation_tpu.rl.ppo import PPO, PPOConfig
from imitation_tpu.util.logger import HierarchicalLogger


class DensityType(enum.Enum):
    """What the density model conditions on (reference density.py:24-34)."""

    STATE_DENSITY = enum.auto()
    STATE_ACTION_DENSITY = enum.auto()
    STATE_STATE_DENSITY = enum.auto()


def gaussian_kde_logpdf(
    x: jnp.ndarray,  # [B, d]
    data: jnp.ndarray,  # [N, d]
    bandwidth: float,
) -> jnp.ndarray:
    """Batched Gaussian KDE log-density, MXU-friendly.

    ||x - d||^2 expanded as x.x - 2 x.d + d.d so the [B, N] cross term is one
    matmul. Matches sklearn KernelDensity(kernel="gaussian").score_samples.
    """
    d = x.shape[-1]
    x_sq = jnp.sum(x * x, axis=-1, keepdims=True)  # [B, 1]
    d_sq = jnp.sum(data * data, axis=-1)  # [N]
    cross = x @ data.T  # [B, N]  <- MXU
    sq_dists = x_sq - 2.0 * cross + d_sq[None, :]
    log_kernel = -sq_dists / (2.0 * bandwidth**2)
    n = data.shape[0]
    log_norm = (
        jnp.log(jnp.asarray(float(n)))
        + 0.5 * d * jnp.log(2.0 * jnp.pi * bandwidth**2)
    )
    return jax.scipy.special.logsumexp(log_kernel, axis=-1) - log_norm


@dataclasses.dataclass
class _Scaler:
    mean: np.ndarray
    std: np.ndarray

    @classmethod
    def fit(cls, data: np.ndarray) -> "_Scaler":
        return cls(
            mean=data.mean(axis=0), std=data.std(axis=0) + 1e-8
        )

    def transform(self, x: jnp.ndarray) -> jnp.ndarray:
        return (x - jnp.asarray(self.mean)) / jnp.asarray(self.std)


class DensityAlgorithm(base.DemonstrationAlgorithm):
    """KDE reward + RL training (reference density.py:37-423)."""

    def __init__(
        self,
        *,
        demonstrations: Optional[base.AnyDemonstrations],
        venv: VectorEnv,
        density_type: DensityType = DensityType.STATE_ACTION_DENSITY,
        kernel: str = "gaussian",
        kernel_bandwidth: float = 0.5,
        rl_algo: Optional[PPO] = None,
        rl_config: Optional[PPOConfig] = None,
        is_stationary: bool = True,
        standardise_inputs: bool = True,
        custom_logger: Optional[HierarchicalLogger] = None,
        allow_variable_horizon: bool = False,
        seed: int = 0,
    ):
        if kernel != "gaussian":
            raise ValueError(f"Unsupported kernel {kernel!r} (gaussian only)")
        self.density_type = density_type
        self.is_stationary = is_stationary
        self.kernel_bandwidth = kernel_bandwidth
        self.standardise = standardise_inputs
        self.venv = venv
        self._scaler: Optional[_Scaler] = None
        # per-timestep data: {t: [N_t, d]}; stationary uses key None
        self._density_data: Optional[Dict[Optional[int], jnp.ndarray]] = None
        self.transitions: Dict[Optional[int], List[np.ndarray]] = {}
        super().__init__(
            demonstrations=demonstrations,
            custom_logger=custom_logger,
            allow_variable_horizon=allow_variable_horizon,
        )
        if rl_algo is None:
            policy = ActorCriticPolicy(
                observation_space=venv.observation_space,
                action_space=venv.action_space,
            )
            rl_algo = PPO(
                venv,
                policy,
                rl_config or PPOConfig(),
                reward_fn=self._reward_relabel_fn,
                seed=seed,
            )
        else:
            rl_algo.reward_fn = self._reward_relabel_fn
            rl_algo.rebind()
        self.rl_algo = rl_algo
        self.rl_state = None

    # -- demonstration ingestion (reference density.py:120-228) ------------
    def set_demonstrations(self, demonstrations: base.AnyDemonstrations) -> None:
        self.transitions = {}
        if isinstance(demonstrations, types.TransitionsMinimal) or isinstance(
            demonstrations, types.TransitionBatch
        ):
            if not self.is_stationary:
                raise ValueError(
                    "Non-stationary density requires trajectories "
                    "(timestep information).",
                )
            batch = base.demonstrations_to_batch(demonstrations)
            obs = np.asarray(batch.obs)
            acts = np.asarray(batch.acts)
            next_obs = np.asarray(batch.next_obs)
            self.transitions[None] = self._flatten(obs, acts, next_obs)
        else:
            items = list(demonstrations)
            if items and isinstance(items[0], types.Trajectory):
                self._check_fixed_horizon(len(t) for t in items)
                for traj in items:
                    obs = np.asarray(types.maybe_unwrap_dictobs(traj.obs))
                    for t in range(len(traj)):
                        key = None if self.is_stationary else t
                        vec = self._flatten(
                            obs[t : t + 1], traj.acts[t : t + 1], obs[t + 1 : t + 2]
                        )
                        self.transitions.setdefault(key, []).append(vec[0])
                self.transitions = {
                    k: np.stack(v) if isinstance(v, list) else v
                    for k, v in self.transitions.items()
                }
            else:
                batch = base.demonstrations_to_batch(items)
                self.transitions[None] = self._flatten(
                    np.asarray(batch.obs),
                    np.asarray(batch.acts),
                    np.asarray(batch.next_obs),
                )

    def _flatten(self, obs: np.ndarray, acts: np.ndarray, next_obs: np.ndarray) -> np.ndarray:
        """Flattened density feature per transition (reference :230-262)."""
        obs = obs.reshape(len(obs), -1)
        next_obs = next_obs.reshape(len(next_obs), -1)
        if self.density_type == DensityType.STATE_DENSITY:
            return obs
        if self.density_type == DensityType.STATE_ACTION_DENSITY:
            acts2 = np.asarray(acts).reshape(len(acts), -1).astype(np.float32)
            return np.concatenate([obs, acts2], axis=1)
        if self.density_type == DensityType.STATE_STATE_DENSITY:
            return np.concatenate([obs, next_obs], axis=1)
        raise ValueError(f"Unknown density type {self.density_type}")

    def _flatten_jax(self, obs, acts, next_obs) -> jnp.ndarray:
        obs = obs.reshape(obs.shape[0], -1)
        next_obs = next_obs.reshape(next_obs.shape[0], -1)
        if self.density_type == DensityType.STATE_DENSITY:
            return obs
        if self.density_type == DensityType.STATE_ACTION_DENSITY:
            acts2 = acts.reshape(acts.shape[0], -1).astype(jnp.float32)
            return jnp.concatenate([obs, acts2], axis=1)
        return jnp.concatenate([obs, next_obs], axis=1)

    def train(self) -> None:
        """Fits the density model (reference density.py:264-293)."""
        if not self.transitions:
            raise ValueError("No demonstrations set.")
        all_data = np.concatenate(list(self.transitions.values()))
        if self.standardise:
            self._scaler = _Scaler.fit(all_data)
        self._density_data = {}
        for k, v in self.transitions.items():
            data = jnp.asarray(v, jnp.float32)
            if self._scaler is not None:
                data = self._scaler.transform(data)
            self._density_data[k] = data

    # -- RewardFn (reference density.py:295-360) ---------------------------
    def __call__(self, state, action, next_state, done) -> np.ndarray:
        """Pure-numpy RewardFn protocol (host convenience)."""
        out = self._reward_relabel_fn(
            None,
            jnp.asarray(state),
            jnp.asarray(action),
            jnp.asarray(next_state),
            jnp.asarray(done),
        )
        return np.asarray(out)

    def _reward_relabel_fn(self, params, obs, acts, next_obs, dones) -> jnp.ndarray:
        # ``params`` carries the fitted density data + scaler stats as a
        # pytree (passed per train_step call), so refitting the KDE takes
        # effect without re-tracing the PPO program.
        if params is None:
            params = self._reward_params()
        x = self._flatten_jax(obs, acts, next_obs)
        x = (x - params["scale_mean"]) / params["scale_std"]
        data = params["data"]  # [M, N, d] stacked per-timestep (M=1 stationary)
        logs = jax.vmap(
            lambda d: gaussian_kde_logpdf(x, d, self.kernel_bandwidth)
        )(data)
        if data.shape[0] == 1:
            return logs[0]
        return jax.scipy.special.logsumexp(logs, axis=0) - jnp.log(
            jnp.asarray(float(data.shape[0]))
        )

    def _reward_params(self):
        """The fitted density model as a pytree for jit arguments."""
        if self._density_data is None:
            raise RuntimeError("Call .train() before computing rewards.")
        vals = list(self._density_data.values())
        max_n = max(v.shape[0] for v in vals)
        # pad per-timestep datasets to a common size by repeating rows
        padded = []
        for v in vals:
            if v.shape[0] < max_n:
                reps = -(-max_n // v.shape[0])
                v = jnp.tile(v, (reps, 1))[:max_n]
            padded.append(v)
        data = jnp.stack(padded)
        if self._scaler is not None:
            mean = jnp.asarray(self._scaler.mean)
            std = jnp.asarray(self._scaler.std)
        else:
            d = data.shape[-1]
            mean, std = jnp.zeros((d,)), jnp.ones((d,))
        # data is stored unscaled-after-transform already; scaling handled on x
        return {"data": data, "scale_mean": mean, "scale_std": std}

    # -- RL on the learned reward (reference density.py:362-422) -----------
    def train_policy(self, n_timesteps: int = 1_000_000) -> None:
        if self.rl_state is None:
            self.rl_state = self.rl_algo.init_state()
        self.rl_state = self.rl_algo.learn(
            self.rl_state, n_timesteps, reward_params=self._reward_params()
        )

    def test_policy(self, *, n_trajectories: int = 10, true_reward: bool = True):
        """Rollout stats for the trained policy (reference density.py:384-422)."""
        if self.rl_state is None:
            raise RuntimeError("train_policy first")
        trajs = rollout_mod.generate_trajectories(
            self.policy.sample_fn(),
            self.rl_state.variables,
            self.venv,
            rollout_mod.make_min_episodes(n_trajectories),
            rng=0,
        )
        return rollout_mod.rollout_stats(trajs)

    @property
    def policy(self) -> ActorCriticPolicy:
        return self.rl_algo.policy

    @property
    def policy_variables(self):
        assert self.rl_state is not None
        return self.rl_state.variables

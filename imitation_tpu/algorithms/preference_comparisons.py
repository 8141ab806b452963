"""Preference comparisons (DRLHP-style RLHF): learn a reward from
trajectory-fragment preferences, train an agent on it.

Counterpart of reference ``algorithms/preference_comparisons.py`` (1753 LoC,
the largest module). Components and their reference anchors:

* ``TrajectoryGenerator`` / ``TrajectoryDataset`` / ``AgentTrainer``
  (reference :51-317) — trajectory sources; AgentTrainer trains a PPO
  generator on the current learned reward and buffers its *true-reward*
  rollouts for preference queries.
* ``PreferenceModel`` (reference :345-533) — Boltzmann preference
  probability from (discounted) fragment return differences, clip threshold
  50, ``noise_prob`` mixing, ensemble-aware.
* ``RandomFragmenter`` (reference :564-665) — length-weighted trajectory
  choice, uniform start, with-replacement, zip-paired.
  ``ActiveSelectionFragmenter`` (reference :668-778) — oversample then keep
  the pairs with highest ensemble variance (logit/probability/label).
* ``SyntheticGatherer`` (reference :781-907) — Bernoulli-sampled or soft
  preferences from ground-truth returns with temperature + entropy logging.
* ``PreferenceDataset`` (reference :909-997) — FIFO max_size queue with
  pickle save/load.
* ``CrossEntropyRewardLoss`` (reference :1013-1098), ``BasicRewardTrainer``
  (reference :1139-1324, AdamW + epochs + optional regularizer w/ train/val
  split), ``EnsembleTrainer`` (reference :1326-1438, member bagging).
* ``PreferenceComparisons`` orchestrator (reference :1482-1753) — query
  schedule (constant/hyperbolic/inverse_quadratic + ``oric`` rounding,
  10% initial), per-iteration sample -> fragment -> gather -> push ->
  train-reward (x200 epochs on iteration 0) -> train-agent.

TPU-native: the reference evaluates fragment rewards in a per-pair Python
loop (reference :441-453). Here a preference batch is ONE fixed-shape
``FragmentBatch`` pytree ([N, 2, L] arrays); reward evaluation over every
step of every fragment of every pair is a single batched reward-net forward,
and the whole reward-model update (probabilities + BCE + optimizer) is one
jitted program.
"""

from __future__ import annotations

import abc
import dataclasses
import math
import pickle
from collections import deque
from typing import (
    Any,
    Callable,
    Dict,
    List,
    Mapping,
    Optional,
    Sequence,
    Tuple,
    Union,
)

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from imitation_tpu.algorithms import base
from imitation_tpu.data import rollout as rollout_mod
from imitation_tpu.data import types
from imitation_tpu.envs.vector import VectorEnv
from imitation_tpu.models.policies import ActorCriticPolicy
from imitation_tpu.policies.exploration_wrapper import ExplorationWrapper
from imitation_tpu.rewards.reward_nets import RewardEnsemble, RewardNet
from imitation_tpu.rl.ppo import PPO, PPOConfig
from imitation_tpu.util import util
from imitation_tpu.util.logger import HierarchicalLogger, configure

TrajectoryWithRewPair = Tuple[types.TrajectoryWithRew, types.TrajectoryWithRew]


# ---------------------------------------------------------------------------
# Trajectory generation
# ---------------------------------------------------------------------------


class TrajectoryGenerator(abc.ABC):
    """Generates trajectories with optional training logic (reference :51-98)."""

    def __init__(self, custom_logger: Optional[HierarchicalLogger] = None):
        self._logger = custom_logger or configure()

    @abc.abstractmethod
    def sample(self, steps: int) -> Sequence[types.TrajectoryWithRew]:
        """Sample at least ``steps`` transitions of trajectories."""

    def train(self, steps: int, **kwargs: Any) -> None:
        """Train an agent if the generator uses one (default no-op)."""

    @property
    def logger(self) -> HierarchicalLogger:
        return self._logger

    @logger.setter
    def logger(self, value: HierarchicalLogger) -> None:
        self._logger = value


class TrajectoryDataset(TrajectoryGenerator):
    """Static trajectory source (reference :99-126)."""

    def __init__(
        self,
        trajectories: Sequence[types.TrajectoryWithRew],
        rng: Union[int, np.random.Generator] = 0,
        custom_logger: Optional[HierarchicalLogger] = None,
    ):
        super().__init__(custom_logger=custom_logger)
        self._trajectories = list(trajectories)
        self.rng = (
            rng if isinstance(rng, np.random.Generator) else np.random.default_rng(rng)
        )

    def sample(self, steps: int) -> Sequence[types.TrajectoryWithRew]:
        # make a copy before shuffling
        trajectories = list(self._trajectories)
        self.rng.shuffle(trajectories)  # type: ignore[arg-type]
        return _get_trajectories(trajectories, steps)


def _get_trajectories(
    trajectories: Sequence[types.TrajectoryWithRew], steps: int
) -> Sequence[types.TrajectoryWithRew]:
    """Get enough trajectories to cover ``steps`` transitions (reference :319-342)."""
    if steps == 0:
        return []
    available_steps = sum(len(traj) for traj in trajectories)
    if available_steps < steps:
        raise RuntimeError(
            f"Asked for {steps} transitions but only {available_steps} available",
        )
    steps_cumsum = np.cumsum([len(traj) for traj in trajectories])
    idx = int((steps_cumsum >= steps).argmax())
    trajectories = trajectories[: idx + 1]
    assert sum(len(traj) for traj in trajectories) >= steps
    return trajectories


def _make_relabel_fn(reward_net: RewardNet, relabel_alpha: Optional[float]):
    """Jittable (variables, s, a, s', d) -> rewards used to relabel the
    generator's training reward.

    ``relabel_alpha`` requires an ensemble: rewards become
    mean + alpha*std over members — the reference's risk-sensitive
    ``add_std_alpha`` path (AddSTDRewardWrapper, reward_nets.py:1019-1078,
    wired by ingredients/reward.py add_std_alpha). Stats stay frozen inside
    the jitted step; AgentTrainer._fold_reward_stats applies the
    update_stats=True semantics outside it.
    """
    if relabel_alpha is not None:
        if not hasattr(reward_net, "predict_reward_moments"):
            raise TypeError(
                "relabel_alpha requires an ensemble reward net "
                "(predict_reward_moments)",
            )

        def relabel_fn(reward_variables, obs, acts, next_obs, dones):
            mean, var = reward_net.apply(
                reward_variables, obs, acts, next_obs, dones,
                method="predict_reward_moments",
            )
            return mean + relabel_alpha * jnp.sqrt(var)

        return relabel_fn

    def relabel_fn(reward_variables, obs, acts, next_obs, dones):
        return reward_net.apply(
            reward_variables, obs, acts, next_obs, dones, False,
            method="predict_processed",
        )

    return relabel_fn


class AgentTrainer(TrajectoryGenerator):
    """PPO generator trained on the learned reward (reference :127-317).

    ``train(steps)`` runs jitted PPO iterations with reward relabeling by the
    current reward-net variables; the true-reward rollout chunks produced
    during training are cut into episodes and buffered, and ``sample`` serves
    from that buffer, topping up with extra rollouts (plus an exploration
    fraction through the Markov-switching ExplorationWrapper) as needed —
    the same bookkeeping as the reference's BufferingWrapper pop + top-up
    (reference :231-307).
    """

    def __init__(
        self,
        algorithm: PPO,
        reward_net: RewardNet,
        venv: VectorEnv,
        rng: Union[int, np.random.Generator] = 0,
        exploration_frac: float = 0.0,
        switch_prob: float = 0.5,
        random_prob: float = 0.5,
        relabel_alpha: Optional[float] = None,
        custom_logger: Optional[HierarchicalLogger] = None,
    ):
        super().__init__(custom_logger=custom_logger)
        self.algorithm = algorithm
        self.reward_net = reward_net
        self.venv = venv
        self.exploration_frac = exploration_frac
        self.rng = (
            rng if isinstance(rng, np.random.Generator) else np.random.default_rng(rng)
        )

        relabel_fn = _make_relabel_fn(reward_net, relabel_alpha)
        algorithm.reward_fn = relabel_fn
        algorithm.return_transitions = True
        algorithm.rebind()
        self.state = algorithm.init_state()
        self.reward_variables: Any = None  # set by orchestrator before train()
        self._fold_stats_jit = None
        self._accum = rollout_mod.TrajectoryAccumulator(venv.num_envs)
        self._buffered: List[types.TrajectoryWithRew] = []
        self._explorer = ExplorationWrapper(
            algorithm.policy.sample_fn(), venv,
            random_prob=random_prob, switch_prob=switch_prob,
        )

    def train(self, steps: int, **kwargs: Any) -> None:
        """Train PPO for ``steps`` env steps on the current learned reward
        (reference :207-229)."""
        if self.reward_variables is None:
            raise RuntimeError("reward_variables not set before AgentTrainer.train")
        steps_per_iter = self.algorithm.config.n_steps * self.venv.num_envs
        n_iters = max(1, int(math.ceil(steps / steps_per_iter)))
        for _ in range(n_iters):
            self.state, metrics, chunk = self.algorithm._train_step_jit(
                self.state, self.reward_variables
            )
            self._fold_reward_stats(chunk)
            self._buffered.extend(self._accum.add_chunk(chunk))
        host = {k: float(v) for k, v in jax.device_get(metrics).items()}
        for k, v in host.items():
            self.logger.record(k, v)

    def _fold_reward_stats(self, chunk) -> None:
        """Folds the relabeled chunk into a NormalizedRewardNet's output
        normalizer (reference relabels with ``update_stats=True``,
        reward_nets.py:613-671; stats collections are immutable inside the
        jitted train step, so the fold is one tiny separate jitted apply)."""
        from imitation_tpu.rewards.reward_nets import (
            NormalizedRewardNet,
            RewardEnsemble,
        )

        normalized = isinstance(self.reward_net, NormalizedRewardNet) or (
            isinstance(self.reward_net, RewardEnsemble)
            and self.reward_net.member_normalize_cls is not None
        )
        if not normalized:
            return
        if self._fold_stats_jit is None:

            def fold(variables, obs, acts, next_obs, dones):
                _, mut = self.reward_net.apply(
                    variables, obs, acts, next_obs, dones, True,
                    method="predict_processed", mutable=["stats"],
                )
                return mut["stats"]

            self._fold_stats_jit = jax.jit(fold)
        T, B = chunk.acts.shape[0], chunk.acts.shape[1]
        flat = lambda x: x.reshape((T * B,) + x.shape[2:])
        dones = (chunk.terminated | chunk.truncated).astype(jnp.float32)
        stats = self._fold_stats_jit(
            self.reward_variables,
            jax.tree.map(flat, chunk.obs),
            flat(chunk.acts),
            jax.tree.map(flat, chunk.next_obs),
            flat(dones),
        )
        self.reward_variables = {**self.reward_variables, "stats": stats}

    def sample(self, steps: int) -> Sequence[types.TrajectoryWithRew]:
        """Serve buffered true-reward episodes; top up if needed
        (reference :231-307)."""
        avail = sum(len(t) for t in self._buffered)
        agent_steps = int(steps * (1 - self.exploration_frac))
        exploration_steps = steps - agent_steps
        while avail < agent_steps:
            extra = rollout_mod.generate_trajectories(
                self.algorithm.policy.sample_fn(),
                self.state.variables,
                self.venv,
                rollout_mod.make_min_timesteps(agent_steps - avail),
                rng=int(self.rng.integers(0, 2**31 - 1)),
            )
            self._buffered.extend(extra)
            avail = sum(len(t) for t in self._buffered)
        self.rng.shuffle(self._buffered)  # type: ignore[arg-type]
        out = _get_trajectories(self._buffered, agent_steps) if agent_steps else []
        out = list(out)
        self._buffered = self._buffered[len(out):]
        if exploration_steps > 0:
            out.extend(self._sample_exploration(exploration_steps))
        return out

    def _sample_exploration(self, steps: int) -> List[types.TrajectoryWithRew]:
        if getattr(self.venv, "is_host", False):
            # Host-stepped env: the scanned device collector can't run;
            # drive the same Markov-switching mixture through the host
            # rollout path.
            return list(
                rollout_mod.generate_trajectories(
                    self._explorer.host_policy_fn(),
                    self.state.variables,
                    self.venv,
                    rollout_mod.make_min_timesteps(steps),
                    rng=int(self.rng.integers(0, 2**31 - 1)),
                )
            )
        key = jax.random.key(int(self.rng.integers(0, 2**31 - 1)))
        key, k_reset, k_mode = jax.random.split(key, 3)
        env_state = self.venv.reset(k_reset)
        mode = self._explorer.initial_mode(k_mode)
        accum = rollout_mod.TrajectoryAccumulator(self.venv.num_envs)
        collected: List[types.TrajectoryWithRew] = []
        collect_jit = jax.jit(self._explorer.collect, static_argnums=(3,))
        chunk_size = 128
        while sum(len(t) for t in collected) < steps:
            key, sub = jax.random.split(key)
            env_state, mode, chunk = collect_jit(
                self.state.variables, env_state, mode, chunk_size, sub
            )
            collected.extend(accum.add_chunk(chunk))
        return collected

    @property
    def policy(self) -> ActorCriticPolicy:
        return self.algorithm.policy

    @property
    def policy_variables(self):
        return self.state.variables


class SACAgentTrainer(TrajectoryGenerator):
    """Off-policy (SAC) trajectory generator for preference comparisons —
    the PEBBLE-style configuration (reference supports SAC generators via the
    rl ingredient + SAC1024Policy, policies/base.py:107-121,
    ingredients/rl.py:104-120).

    Replay relabeling: every sampled TD batch's rewards are recomputed with
    the CURRENT reward net (the reference's ReplayBufferRewardWrapper,
    policies/replay_buffer_wrapper.py:26-103), so stale replay stays
    consistent as the reward model trains.
    """

    def __init__(
        self,
        algorithm,  # rl.sac.SAC
        reward_net: RewardNet,
        venv: VectorEnv,
        rng: Union[int, np.random.Generator] = 0,
        exploration_frac: float = 0.0,
        relabel_alpha: Optional[float] = None,
        custom_logger: Optional[HierarchicalLogger] = None,
    ):
        super().__init__(custom_logger=custom_logger)
        self.algorithm = algorithm
        self.reward_net = reward_net
        self.venv = venv
        self.exploration_frac = exploration_frac
        self.rng = (
            rng if isinstance(rng, np.random.Generator) else np.random.default_rng(rng)
        )
        point_fn = _make_relabel_fn(reward_net, relabel_alpha)

        def relabel_fn(reward_params, batch):
            rews = point_fn(
                reward_params, batch.obs, batch.acts, batch.next_obs, batch.dones
            )
            return batch.replace(rews=rews)

        algorithm.relabel_fn = relabel_fn
        algorithm.rebind()  # keeps the host-env dispatch intact
        self.state = algorithm.init_state()
        self.reward_variables: Any = None
        self._explorer = ExplorationWrapper(algorithm.sample_fn(), venv)
        self._fold_stats_jit = None

    def train(self, steps: int, **kwargs: Any) -> None:
        if self.reward_variables is None:
            raise RuntimeError("reward_variables not set before train()")
        self.state = self.algorithm.learn(
            self.state, steps, reward_params=self.reward_variables
        )
        self._fold_reward_stats()

    def _fold_reward_stats(self) -> None:
        """Folds a replay sample into a NormalizedRewardNet's output
        normalizer (update_stats=True relabel semantics; mirrors
        AgentTrainer._fold_reward_stats for the off-policy generator)."""
        from imitation_tpu.rewards.reward_nets import (
            NormalizedRewardNet,
            RewardEnsemble,
        )

        normalized = isinstance(self.reward_net, NormalizedRewardNet) or (
            isinstance(self.reward_net, RewardEnsemble)
            and self.reward_net.member_normalize_cls is not None
        )
        if not normalized:
            return
        # Match the learner's own sample size, and skip folding until the
        # buffer actually holds that many rows — a with-replacement sample
        # over a near-empty buffer would over-weight its few transitions in
        # the normalizer stats.
        n_fold = int(self.algorithm.config.batch_size)
        if int(self.state.buffer_state.size) < n_fold:
            return
        if self._fold_stats_jit is None:

            def fold(variables, key, buffer_state):
                batch = self.algorithm.replay.sample(buffer_state, key, n_fold)
                _, mut = self.reward_net.apply(
                    variables, batch.obs, batch.acts, batch.next_obs,
                    batch.dones, True,
                    method="predict_processed", mutable=["stats"],
                )
                return mut["stats"]

            self._fold_stats_jit = jax.jit(fold)
        key = jax.random.key(int(self.rng.integers(0, 2**31 - 1)))
        stats = self._fold_stats_jit(
            self.reward_variables, key, self.state.buffer_state
        )
        self.reward_variables = {**self.reward_variables, "stats": stats}

    def sample(self, steps: int) -> Sequence[types.TrajectoryWithRew]:
        agent_steps = int(steps * (1 - self.exploration_frac))
        out: List[types.TrajectoryWithRew] = []
        if agent_steps > 0:
            out.extend(
                rollout_mod.generate_trajectories(
                    self.algorithm.sample_fn(),
                    {"params": self.state.actor_params},
                    self.venv,
                    rollout_mod.make_min_timesteps(agent_steps),
                    rng=int(self.rng.integers(0, 2**31 - 1)),
                )
            )
        exploration_steps = steps - agent_steps
        if exploration_steps > 0:
            if getattr(self.venv, "is_host", False):
                # Host-stepped env (MuJoCo/gym-bridge): the scanned device
                # collector can't run; drive the same Markov-switching
                # mixture through the host rollout path (mirrors
                # AgentTrainer._sample_exploration).
                out.extend(
                    rollout_mod.generate_trajectories(
                        self._explorer.host_policy_fn(),
                        {"params": self.state.actor_params},
                        self.venv,
                        rollout_mod.make_min_timesteps(exploration_steps),
                        rng=int(self.rng.integers(0, 2**31 - 1)),
                    )
                )
                return out
            key = jax.random.key(int(self.rng.integers(0, 2**31 - 1)))
            key, k_reset, k_mode = jax.random.split(key, 3)
            env_state = self.venv.reset(k_reset)
            mode = self._explorer.initial_mode(k_mode)
            accum = rollout_mod.TrajectoryAccumulator(self.venv.num_envs)
            collect_jit = jax.jit(self._explorer.collect, static_argnums=(3,))
            collected: List[types.TrajectoryWithRew] = []
            while sum(len(t) for t in collected) < exploration_steps:
                key, sub = jax.random.split(key)
                env_state, mode, chunk = collect_jit(
                    {"params": self.state.actor_params}, env_state, mode, 128, sub
                )
                collected.extend(accum.add_chunk(chunk))
            out.extend(collected)
        return out

    @property
    def policy(self):
        return self.algorithm.policy

    @property
    def policy_variables(self):
        return {"params": self.state.actor_params}


# ---------------------------------------------------------------------------
# Device fragment batches + preference model
# ---------------------------------------------------------------------------


@struct.dataclass
class FragmentBatch:
    """Fixed-shape device batch of fragment pairs.

    ``obs[n, j, t]`` for pair n, side j in {0,1}, step t in [0, L]; actions
    and ground-truth rewards over t in [0, L). All reward-net evaluations
    flatten (n, j, t) into one giant batch — the TPU answer to the
    reference's per-pair loop (reference :441-453).
    """

    obs: jnp.ndarray  # [N, 2, L+1, ...]
    acts: jnp.ndarray  # [N, 2, L, ...]
    rews_gt: jnp.ndarray  # [N, 2, L]
    dones: jnp.ndarray  # [N, 2, L]
    prefs: jnp.ndarray  # [N] probability fragment 0 (first) is preferred

    @property
    def num_pairs(self) -> int:
        return self.obs.shape[0]

    @property
    def fragment_length(self) -> int:
        return self.acts.shape[2]

    @classmethod
    def from_pairs(
        cls,
        pairs: Sequence[TrajectoryWithRewPair],
        prefs: np.ndarray,
    ) -> "FragmentBatch":
        L = len(pairs[0][0])
        for f1, f2 in pairs:
            if len(f1) != L or len(f2) != L:
                raise ValueError("all fragments must have equal length")
        obs = np.stack(
            [[np.asarray(types.maybe_unwrap_dictobs(f.obs)) for f in pair] for pair in pairs]
        )
        acts = np.stack([[np.asarray(f.acts) for f in pair] for pair in pairs])
        rews = np.stack([[np.asarray(f.rews) for f in pair] for pair in pairs])
        dones = np.zeros((len(pairs), 2, L), np.float32)
        for n, pair in enumerate(pairs):
            for j, f in enumerate(pair):
                if f.terminal:
                    dones[n, j, -1] = 1.0
        return cls(
            obs=jnp.asarray(obs),
            acts=jnp.asarray(acts),
            rews_gt=jnp.asarray(rews, jnp.float32),
            dones=jnp.asarray(dones),
            prefs=jnp.asarray(np.asarray(prefs, np.float32)),
        )


@dataclasses.dataclass
class PreferenceModel:
    """Boltzmann preference probabilities from a reward net (reference :345-533)."""

    model: RewardNet
    noise_prob: float = 0.0
    discount_factor: float = 1.0
    threshold: float = 50.0

    def __post_init__(self):
        self.is_ensemble = isinstance(self.model, RewardEnsemble)

    def fragment_rewards(self, variables, batch: FragmentBatch) -> jnp.ndarray:
        """Predicted rewards for every step: [(M,) N, 2, L]."""
        N, _, Lp1 = batch.obs.shape[:3]
        L = Lp1 - 1
        flat_steps = N * 2 * L
        obs = batch.obs[:, :, :-1].reshape((flat_steps,) + batch.obs.shape[3:])
        next_obs = batch.obs[:, :, 1:].reshape((flat_steps,) + batch.obs.shape[3:])
        acts = batch.acts.reshape((flat_steps,) + batch.acts.shape[3:])
        dones = batch.dones.reshape(flat_steps)
        rews = self.model.apply(variables, obs, acts, next_obs, dones)
        if self.is_ensemble:
            return rews.reshape((rews.shape[0], N, 2, L))
        return rews.reshape((N, 2, L))

    def probability_from_rewards(self, rews: jnp.ndarray) -> jnp.ndarray:
        """[(M,) N] probability first fragment preferred (reference :487-533)."""
        L = rews.shape[-1]
        if self.discount_factor == 1.0:
            returns = rews.sum(axis=-1)
        else:
            discounts = self.discount_factor ** jnp.arange(L, dtype=rews.dtype)
            returns = (rews * discounts).sum(axis=-1)
        returns_diff = returns[..., 1] - returns[..., 0]  # r2 - r1
        returns_diff = jnp.clip(returns_diff, -self.threshold, self.threshold)
        model_probability = 1.0 / (1.0 + jnp.exp(returns_diff))
        return self.noise_prob * 0.5 + (1 - self.noise_prob) * model_probability

    def __call__(self, variables, batch: FragmentBatch) -> jnp.ndarray:
        return self.probability_from_rewards(self.fragment_rewards(variables, batch))

    def member_fragment_rewards(self, variables, batch: FragmentBatch) -> jnp.ndarray:
        """Per-member rewards for per-member (bagged) batches.

        ``batch`` arrays carry a leading member axis — ``obs[m, n, j, t]`` —
        and member ``m``'s slice is evaluated only by ensemble member ``m``
        (the TPU form of the reference's dataset bagging, reference
        preference_comparisons.py:1408-1424: one vmapped forward over
        (member params, member data) instead of M separate trainers).
        Returns ``[M, N, 2, L]``.
        """
        if not self.is_ensemble:
            raise TypeError("member_fragment_rewards requires a RewardEnsemble.")
        member_net = self.model.member_cls(
            observation_space=self.model.observation_space,
            action_space=self.model.action_space,
            **(self.model.member_kwargs or {}),
        )
        if getattr(self.model, "member_normalize_cls", None) is not None:
            # normalized members: wrap so the per-member param tree matches
            # (training applies the raw forward = base reward either way)
            from imitation_tpu.rewards.reward_nets import NormalizedRewardNet

            member_net = NormalizedRewardNet(
                observation_space=self.model.observation_space,
                action_space=self.model.action_space,
                base=member_net,
                normalize_cls=self.model.member_normalize_cls,
            )
        member_vars = {"params": variables["params"]["members"]}
        if "stats" in variables:
            member_vars["stats"] = variables["stats"]["members"]

        def one(mvars, obs, acts, dones):
            N, _, Lp1 = obs.shape[:3]
            L = Lp1 - 1
            flat_steps = N * 2 * L
            o = obs[:, :, :-1].reshape((flat_steps,) + obs.shape[3:])
            no = obs[:, :, 1:].reshape((flat_steps,) + obs.shape[3:])
            a = acts.reshape((flat_steps,) + acts.shape[3:])
            d = dones.reshape(flat_steps)
            return member_net.apply(mvars, o, a, no, d).reshape((N, 2, L))

        return jax.vmap(one)(member_vars, batch.obs, batch.acts, batch.dones)


# ---------------------------------------------------------------------------
# Fragmenters
# ---------------------------------------------------------------------------


class Fragmenter(abc.ABC):
    """Creates fragment pairs from trajectories (reference :536-561)."""

    def __init__(self, custom_logger: Optional[HierarchicalLogger] = None):
        self.logger = custom_logger or configure()

    @abc.abstractmethod
    def __call__(
        self,
        trajectories: Sequence[types.TrajectoryWithRew],
        fragment_length: int,
        num_pairs: int,
    ) -> Sequence[TrajectoryWithRewPair]:
        ...


class RandomFragmenter(Fragmenter):
    """Uniform random fragments (reference :564-665): trajectories chosen
    with probability proportional to length, fragment start uniform, with
    replacement; fragments zip-paired."""

    def __init__(
        self,
        rng: Union[int, np.random.Generator] = 0,
        warning_threshold: int = 10,
        custom_logger: Optional[HierarchicalLogger] = None,
    ):
        super().__init__(custom_logger)
        self.rng = (
            rng if isinstance(rng, np.random.Generator) else np.random.default_rng(rng)
        )
        self.warning_threshold = warning_threshold

    def __call__(self, trajectories, fragment_length, num_pairs):
        fragments: List[types.TrajectoryWithRew] = []
        prev_num_trajectories = len(trajectories)
        trajectories = [t for t in trajectories if len(t) >= fragment_length]
        if len(trajectories) == 0:
            raise ValueError(
                "No trajectories are long enough for the desired fragment length "
                f"of {fragment_length}.",
            )
        num_discarded = prev_num_trajectories - len(trajectories)
        if num_discarded:
            self.logger.info(
                f"Discarded {num_discarded} out of {prev_num_trajectories} "
                "trajectories because they are shorter than the desired length "
                f"of {fragment_length}.",
            )
        weights = [len(t) for t in trajectories]
        num_transitions = 2 * num_pairs * fragment_length
        if sum(weights) < num_transitions:
            self.logger.warn(
                "Fewer transitions available than needed for desired number "
                "of fragment pairs. Some transitions will appear multiple times.",
            )
        elif (
            self.warning_threshold
            and sum(weights) < self.warning_threshold * num_transitions
        ):
            self.logger.warn(
                f"Samples will contain {num_transitions} transitions in total "
                f"and only {sum(weights)} are available. "
                f"Because we sample with replacement, a significant number "
                "of transitions are likely to appear multiple times.",
            )
        for _ in range(2 * num_pairs):
            traj_idx = self.rng.choice(
                len(trajectories), p=np.array(weights) / sum(weights)
            )
            traj = trajectories[traj_idx]
            n = len(traj)
            start = self.rng.integers(0, n - fragment_length, endpoint=True)
            end = start + fragment_length
            terminal = bool((end == n) and traj.terminal)
            fragment = types.TrajectoryWithRew(
                obs=traj.obs[start : end + 1],
                acts=traj.acts[start:end],
                infos=traj.infos[start:end] if traj.infos is not None else None,
                rews=traj.rews[start:end],
                terminal=terminal,
            )
            fragments.append(fragment)
        iterator = iter(fragments)
        return list(zip(iterator, iterator))


class ActiveSelectionFragmenter(Fragmenter):
    """Keep the highest-uncertainty pairs from an oversampled pool
    (reference :668-778). Requires an ensemble reward model."""

    def __init__(
        self,
        preference_model: PreferenceModel,
        base_fragmenter: Fragmenter,
        fragment_sample_factor: float,
        uncertainty_on: str = "logit",
        custom_logger: Optional[HierarchicalLogger] = None,
    ):
        super().__init__(custom_logger)
        if not preference_model.is_ensemble:
            raise ValueError(
                "PreferenceModel not wrapped over an ensemble of networks.",
            )
        self.preference_model = preference_model
        self.base_fragmenter = base_fragmenter
        self.fragment_sample_factor = fragment_sample_factor
        self._uncertainty_on = uncertainty_on
        if uncertainty_on not in ("logit", "probability", "label"):
            self.raise_uncertainty_on_not_supported()
        self.variables: Any = None  # current reward variables, set per round

    @property
    def uncertainty_on(self) -> str:
        return self._uncertainty_on

    def raise_uncertainty_on_not_supported(self):
        raise ValueError(
            f"""{self.uncertainty_on} not supported.
            `uncertainty_on` should be from `logit`, `probability`, or `label`""",
        )

    def __call__(self, trajectories, fragment_length, num_pairs):
        if self.variables is None:
            raise RuntimeError("set .variables to the reward net variables first")
        fragments_to_sample = int(self.fragment_sample_factor * num_pairs)
        fragment_pairs = self.base_fragmenter(
            trajectories=trajectories,
            fragment_length=fragment_length,
            num_pairs=fragments_to_sample,
        )
        batch = FragmentBatch.from_pairs(
            fragment_pairs, np.zeros(len(fragment_pairs))
        )
        rews = self.preference_model.fragment_rewards(self.variables, batch)
        # rews: [M, N, 2, L]
        returns = np.asarray(rews.sum(axis=-1))  # [M, N, 2]
        if self.uncertainty_on == "logit":
            var_estimates = (returns[..., 0] - returns[..., 1]).var(axis=0)  # [N]
        else:
            probs = np.asarray(
                self.preference_model.probability_from_rewards(rews)
            )  # [M, N]
            if self.uncertainty_on == "probability":
                var_estimates = probs.var(axis=0)
            else:  # label
                preds = (probs > 0.5).astype(np.float32)
                prob_estimate = preds.mean(axis=0)
                var_estimates = prob_estimate * (1 - prob_estimate)
        fragment_idxs = np.argsort(var_estimates)[::-1]
        return [fragment_pairs[i] for i in fragment_idxs[:num_pairs]]


# ---------------------------------------------------------------------------
# Preference gathering
# ---------------------------------------------------------------------------


class PreferenceGatherer(abc.ABC):
    """Gathers preferences for fragment pairs (reference :781-818)."""

    def __init__(
        self,
        rng: Optional[np.random.Generator] = None,
        custom_logger: Optional[HierarchicalLogger] = None,
    ):
        self.logger = custom_logger or configure()
        self.rng = rng

    @abc.abstractmethod
    def __call__(self, fragment_pairs: Sequence[TrajectoryWithRewPair]) -> np.ndarray:
        ...


class SyntheticGatherer(PreferenceGatherer):
    """Ground-truth-return preferences (reference :821-907)."""

    def __init__(
        self,
        temperature: float = 1.0,
        discount_factor: float = 1.0,
        sample: bool = True,
        rng: Optional[Union[int, np.random.Generator]] = None,
        threshold: float = 50.0,
        custom_logger: Optional[HierarchicalLogger] = None,
    ):
        if isinstance(rng, int):
            rng = np.random.default_rng(rng)
        super().__init__(rng=rng, custom_logger=custom_logger)
        self.temperature = temperature
        self.discount_factor = discount_factor
        self.sample = sample
        self.threshold = threshold
        if self.sample and self.rng is None:
            raise ValueError("If `sample` is True, then `rng` must be provided.")

    def __call__(self, fragment_pairs: Sequence[TrajectoryWithRewPair]) -> np.ndarray:
        returns1, returns2 = self._reward_sums(fragment_pairs)
        if self.temperature == 0:
            return (np.sign(returns1 - returns2) + 1) / 2
        returns1 = returns1 / self.temperature
        returns2 = returns2 / self.temperature
        returns_diff = np.clip(returns2 - returns1, -self.threshold, self.threshold)
        model_probs = 1 / (1 + np.exp(returns_diff))
        from scipy import special

        entropy = -(
            special.xlogy(model_probs, model_probs)
            + special.xlogy(1 - model_probs, 1 - model_probs)
        ).mean()
        self.logger.record("entropy", float(entropy))
        if self.sample:
            assert self.rng is not None
            return self.rng.binomial(n=1, p=model_probs).astype(np.float32)
        return model_probs

    def _reward_sums(self, fragment_pairs) -> Tuple[np.ndarray, np.ndarray]:
        rews1, rews2 = zip(
            *[
                (
                    rollout_mod.discounted_sum(f1.rews, self.discount_factor),
                    rollout_mod.discounted_sum(f2.rews, self.discount_factor),
                )
                for f1, f2 in fragment_pairs
            ],
        )
        return np.array(rews1, dtype=np.float32), np.array(rews2, dtype=np.float32)


# ---------------------------------------------------------------------------
# Preference dataset
# ---------------------------------------------------------------------------


class PreferenceDataset:
    """FIFO dataset of (fragment pair, preference) (reference :909-997)."""

    def __init__(self, max_size: Optional[int] = None):
        self.fragments1: deque = deque(maxlen=max_size)
        self.fragments2: deque = deque(maxlen=max_size)
        self.max_size = max_size
        self.preferences: np.ndarray = np.array([])

    def push(
        self,
        fragments: Sequence[TrajectoryWithRewPair],
        preferences: np.ndarray,
    ) -> None:
        fragments1, fragments2 = zip(*fragments)
        if preferences.shape != (len(fragments),):
            raise ValueError(
                f"Unexpected preferences shape {preferences.shape}, "
                f"expected {(len(fragments),)}",
            )
        if preferences.dtype != np.float32:
            raise ValueError("preferences should have dtype float32")
        self.fragments1.extend(fragments1)
        self.fragments2.extend(fragments2)
        self.preferences = np.concatenate((self.preferences, preferences))
        # FIFO eviction mirrors the deques' maxlen behavior (reference :934-969).
        if self.max_size is not None and len(self.preferences) > self.max_size:
            self.preferences = self.preferences[-self.max_size:]
        assert len(self.preferences) == len(self.fragments1)

    def __getitem__(self, key):
        return (self.fragments1[key], self.fragments2[key]), self.preferences[key]

    def __len__(self) -> int:
        assert len(self.fragments1) == len(self.fragments2) == len(self.preferences)
        return len(self.fragments1)

    def save(self, path) -> None:
        with open(path, "wb") as file:
            pickle.dump(self, file)

    @staticmethod
    def load(path) -> "PreferenceDataset":
        with open(path, "rb") as file:
            return pickle.load(file)

    def as_batch(self) -> FragmentBatch:
        pairs = list(zip(self.fragments1, self.fragments2))
        return FragmentBatch.from_pairs(pairs, self.preferences)


# ---------------------------------------------------------------------------
# Reward losses + trainers
# ---------------------------------------------------------------------------


@struct.dataclass
class LossAndMetrics:
    """Loss + metrics (reference :1002-1010)."""

    loss: jnp.ndarray
    metrics: Dict[str, jnp.ndarray]


class RewardLoss(abc.ABC):
    """Loss on a preference batch (reference :1013-1035).

    ``weights`` (optional, ``[N]``) marks real samples (1.0) vs padding
    (0.0): all means become weighted means. Padding keeps batch shapes
    static under jit — the TPU replacement for the reference's
    variable-length trailing minibatches.
    """

    @abc.abstractmethod
    def __call__(
        self,
        preference_model: PreferenceModel,
        variables: Any,
        batch: FragmentBatch,
        weights: Optional[jnp.ndarray] = None,
    ) -> LossAndMetrics:
        ...


class CrossEntropyRewardLoss(RewardLoss):
    """BCE between predicted and target preferences (reference :1043-1098)."""

    def __call__(
        self, preference_model, variables, batch, weights=None
    ) -> LossAndMetrics:
        probs = preference_model(variables, batch)  # [(M,) N]
        prefs = batch.prefs
        if probs.ndim == 2:  # ensemble: broadcast targets over members
            prefs = prefs[None, :]
        if weights is None:
            w = jnp.ones(batch.prefs.shape[0], batch.prefs.dtype)
        else:
            w = weights
        denom = jnp.maximum(w.sum(), 1e-8)
        # Weighted mean over the pair axis, then mean over members (if any).
        wmean = lambda x: ((x * w).sum(axis=-1) / denom).mean()
        probs_c = jnp.clip(probs, 1e-7, 1 - 1e-7)
        bce = -(prefs * jnp.log(probs_c) + (1 - prefs) * jnp.log(1 - probs_c))
        loss = wmean(bce)
        correct = ((probs > 0.5) == (prefs > 0.5)).astype(jnp.float32)
        accuracy = wmean(correct)
        # gt_reward_loss: BCE of the preferences implied by ground-truth
        # rewards against the labels (irreducible loss floor, reference :1080-1090).
        gt_probs = preference_model.probability_from_rewards(batch.rews_gt)
        gt_probs_c = jnp.clip(gt_probs, 1e-7, 1 - 1e-7)
        gt_prefs = batch.prefs
        gt_bce = -(
            gt_prefs * jnp.log(gt_probs_c) + (1 - gt_prefs) * jnp.log(1 - gt_probs_c)
        )
        gt_loss = (gt_bce * w).sum() / denom
        return LossAndMetrics(
            loss=loss,
            metrics={"accuracy": accuracy, "gt_reward_loss": gt_loss},
        )


class RewardTrainer(abc.ABC):
    """Abstract reward-model trainer (reference :1101-1136)."""

    def __init__(
        self,
        preference_model: PreferenceModel,
        custom_logger: Optional[HierarchicalLogger] = None,
    ):
        self.preference_model = preference_model
        self._logger = custom_logger or configure()

    @property
    def logger(self) -> HierarchicalLogger:
        return self._logger

    @logger.setter
    def logger(self, value: HierarchicalLogger) -> None:
        self._logger = value

    def train(
        self, dataset: PreferenceDataset, epoch_multiplier: float = 1.0
    ) -> Dict[str, float]:
        """Trains and returns the final-epoch train metrics (loss/accuracy/...)
        so callers need not scrape logger internals."""
        with self.logger.accumulate_means("reward"):
            return self._train(dataset, epoch_multiplier) or {}

    @abc.abstractmethod
    def _train(
        self, dataset: PreferenceDataset, epoch_multiplier: float
    ) -> Dict[str, float]:
        ...


class BasicRewardTrainer(RewardTrainer):
    """Epoch-based AdamW reward training (reference :1139-1324)."""

    def __init__(
        self,
        preference_model: PreferenceModel,
        loss: Optional[RewardLoss] = None,
        rng: Union[int, np.random.Generator] = 0,
        batch_size: int = 32,
        minibatch_size: Optional[int] = None,
        epochs: int = 1,
        lr: float = 1e-3,
        weight_decay: float = 0.0,
        regularizer_factory: Optional[Any] = None,
        custom_logger: Optional[HierarchicalLogger] = None,
        seed: int = 0,
    ):
        super().__init__(preference_model, custom_logger)
        self.loss = loss or CrossEntropyRewardLoss()
        self.batch_size = batch_size
        self.minibatch_size = minibatch_size or batch_size
        if self.batch_size % self.minibatch_size != 0:
            raise ValueError("batch_size must be a multiple of minibatch_size.")
        self.epochs = epochs
        self.optimizer = optax.adamw(lr, weight_decay=weight_decay)
        self.rng = (
            rng if isinstance(rng, np.random.Generator) else np.random.default_rng(rng)
        )
        self.variables: Any = None
        self.opt_state: Any = None
        self.regularizer = (
            regularizer_factory(optimizer=self.optimizer, logger=self.logger)
            if regularizer_factory is not None
            else None
        )
        self._key = jax.random.key(seed)
        # Optional NamedSharding for update batches (set by
        # parallel.mesh.shard_preference_comparisons): fragment batches are
        # placed with their sample axis over 'dp' before each jitted update
        # so the reward-gradient psum runs over the mesh.
        self.batch_sharding = None
        self._update_jit = jax.jit(self._update)

    def attach(self, variables: Any) -> None:
        """Binds reward-net variables (called once by the orchestrator)."""
        self.variables = variables
        self.opt_state = self.optimizer.init(variables["params"])

    @property
    def requires_regularizer_update(self) -> bool:
        return self.regularizer is not None and self.regularizer.val_split is not None

    def _update(
        self,
        variables,
        opt_state,
        batch: FragmentBatch,
        weights: jnp.ndarray,
        lam: jnp.ndarray,
    ):
        """One optimizer step on a fixed-shape padded ``batch``.

        ``weights`` marks real samples (1.0) vs padding (0.0). The gradient
        is ``(1/batch_size) * sum_i w_i * grad(bce_i)`` — the reference's
        minibatch renormalization (:1253-1282: loss scaled by
        ``len(minibatch)/batch_size``, incomplete trailing batches giving
        proportionally smaller gradients) — accumulated over
        ``minibatch_size`` slices with ``lax.scan`` so the device holds one
        minibatch of activations at a time. Static shapes mean one compiled
        program no matter how the preference dataset grows.
        """
        n = batch.prefs.shape[0]
        mb = min(self.minibatch_size, n)
        k = n // mb
        params0 = variables["params"]

        def mb_grads(mb_batch, w):
            def loss_fn(params):
                v = {**variables, "params": params}
                out = self.loss(self.preference_model, v, mb_batch, weights=w)
                # weighted mean -> sum / batch_size (reference scaling)
                return out.loss * w.sum() / self.batch_size, out

            (_, out), g = jax.value_and_grad(loss_fn, has_aux=True)(params0)
            return g, out

        batch_k = jax.tree.map(lambda x: x.reshape((k, mb) + x.shape[1:]), batch)
        w_k = weights.reshape((k, mb))

        def body(acc, xs):
            mb_batch, w = xs
            g, out = mb_grads(mb_batch, w)
            wsum = w.sum()
            stats = {**out.metrics, "loss": out.loss}
            stats = jax.tree.map(lambda m: m * wsum, stats)
            return jax.tree.map(jnp.add, acc, g), stats

        zero = jax.tree.map(jnp.zeros_like, params0)
        grads, stats_k = jax.lax.scan(body, zero, (batch_k, w_k))
        if self.regularizer is not None:
            g_pen = jax.grad(lambda p: lam * self.regularizer.loss_penalty(p))(
                params0
            )
            grads = jax.tree.map(jnp.add, grads, g_pen)
        total_w = jnp.maximum(weights.sum(), 1e-8)
        metrics = jax.tree.map(lambda s: s.sum(0) / total_w, stats_k)
        updates, opt_state = self.optimizer.update(grads, opt_state, params0)
        params = optax.apply_updates(params0, updates)
        return {**variables, "params": params}, opt_state, metrics

    def _eval_loss(self, variables, batch: FragmentBatch) -> float:
        out = self.loss(self.preference_model, variables, batch)
        return float(out.loss)

    def _split_dataset(self, dataset: PreferenceDataset):
        """Train/val split per the regularizer's val_split (reference
        :1198-1216). Returns (train_batch, val_batch_or_None)."""
        if self.regularizer is not None and self.regularizer.val_split is not None:
            val_length = int(len(dataset) * self.regularizer.val_split)
            train_length = len(dataset) - val_length
            if val_length < 1 or train_length < 1:
                raise ValueError(
                    "Not enough data samples to split into training and "
                    "validation, or the validation split is too large/small. "
                    "Make sure you've generated enough initial preference data. "
                    "You can adjust this through initial_comparison_frac in "
                    "PreferenceComparisons.",
                )
            perm = self.rng.permutation(len(dataset))
            train_idx, val_idx = perm[:train_length], perm[train_length:]
        else:
            train_idx = np.arange(len(dataset))
            val_idx = None

        full = dataset.as_batch()
        take = lambda idx: jax.tree.map(lambda x: x[jnp.asarray(idx)], full)
        train_batch_all = take(train_idx)
        val_batch = take(val_idx) if val_idx is not None else None
        return train_batch_all, val_batch

    def _train(self, dataset: PreferenceDataset, epoch_multiplier: float = 1.0) -> None:
        if self.variables is None:
            raise RuntimeError("call .attach(reward_variables) first")
        train_batch_all, val_batch = self._split_dataset(dataset)

        epochs = max(1, int(round(self.epochs * epoch_multiplier)))
        n = int(train_batch_all.prefs.shape[0])
        bs = min(self.batch_size, n)
        lam = jnp.asarray(
            self.regularizer.lambda_ if self.regularizer is not None else 0.0,
            jnp.float32,
        )
        last_metrics: Dict[str, float] = {}
        for _ in range(epochs):
            perm = self.rng.permutation(n)
            # Every batch (incl. incomplete trailing ones, reference
            # :1267-1283) is padded to self.batch_size with weight-0 rows:
            # one static jit shape regardless of dataset size.
            for i in range(0, n, bs):
                sel = perm[i : i + bs]
                w = np.zeros(self.batch_size, np.float32)
                w[: len(sel)] = 1.0
                sel = np.concatenate(
                    [sel, np.zeros(self.batch_size - len(sel), sel.dtype)]
                )
                mb = jax.tree.map(lambda x: x[jnp.asarray(sel)], train_batch_all)
                w_dev = jnp.asarray(w)
                if self.batch_sharding is not None:
                    mb = jax.tree.map(
                        lambda x: jax.device_put(x, self.batch_sharding), mb
                    )
                    w_dev = jax.device_put(w_dev, self.batch_sharding)
                self.variables, self.opt_state, metrics = self._update_jit(
                    self.variables, self.opt_state, mb, w_dev, lam
                )
            last_metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
            for k, v in last_metrics.items():
                self.logger.record(k, v)
        # Regularizer lambda update from train/val loss ratio
        # (reference :1218-1296).
        if self.regularizer is not None and val_batch is not None:
            train_loss = self._eval_loss(self.variables, train_batch_all)
            val_loss = self._eval_loss(self.variables, val_batch)
            self.logger.record("val_loss", val_loss)
            self.regularizer.update_params(train_loss, val_loss)
        # final metrics under reward/final/train (reference train loop reads these)
        for k, v in last_metrics.items():
            self.logger.record(f"final/train/{k}", v)
        return last_metrics


class EnsembleTrainer(BasicRewardTrainer):
    """Ensemble trainer with member bagging (reference :1326-1438): per
    ``train`` call, each member draws an independent with-replacement
    resample of the training set and runs its epochs on that resample.
    All members still train in one vmapped program (member axis on the MXU)
    rather than the reference's loop of M separate trainers."""

    def __init__(self, preference_model: PreferenceModel, **kwargs):
        if not preference_model.is_ensemble:
            raise TypeError(
                "PreferenceModel of a RewardEnsemble expected by EnsembleTrainer.",
            )
        super().__init__(preference_model, **kwargs)
        self.num_members = preference_model.model.num_members

    def _update(
        self,
        variables,
        opt_state,
        batch: FragmentBatch,
        weights: jnp.ndarray,
        lam: jnp.ndarray,
    ):
        """One step on per-member padded batches ``[M, b, ...]``.

        ``weights [M, b]`` marks real vs padding rows. Gradients are
        accumulated over ``minibatch_size`` slices of the pair axis
        (reference :1253-1282 semantics, per member)."""
        b = batch.prefs.shape[1]
        mb = min(self.minibatch_size, b)
        params0 = variables["params"]

        def minibatch_loss(params, mb_batch, w):
            v = {**variables, "params": params}
            rews = self.preference_model.member_fragment_rewards(v, mb_batch)
            probs = self.preference_model.probability_from_rewards(rews)  # [M, b]
            prefs = mb_batch.prefs
            probs_c = jnp.clip(probs, 1e-7, 1 - 1e-7)
            bce = -(
                prefs * jnp.log(probs_c) + (1 - prefs) * jnp.log(1 - probs_c)
            )
            denom = jnp.maximum(w.sum(axis=1), 1e-8)  # [M]
            per_member = (bce * w).sum(axis=1) / denom
            correct = ((probs > 0.5) == (prefs > 0.5)).astype(jnp.float32)
            acc_m = (correct * w).sum(axis=1) / denom
            l2 = sum(jnp.sum(jnp.square(p)) for p in jax.tree.leaves(params))
            metrics = {
                "accuracy": acc_m.mean(),
                "accuracy_std": acc_m.std(),
                "loss": per_member.mean(),
                "loss_std": per_member.std(),
            }
            # weighted mean -> sum / batch_size (reference scaling); the l2
            # penalty's slice fractions sum to exactly 1 per optimizer step.
            wsum = w.sum() / weights.shape[0]  # real pairs in this slice
            total = per_member.mean() * wsum / self.batch_size
            total = total + lam * l2 * (
                w.sum() / jnp.maximum(weights.sum(), 1e-8)
            )
            return total, metrics

        grad_fn = jax.value_and_grad(minibatch_loss, has_aux=True)
        grads = jax.tree.map(jnp.zeros_like, params0)
        metrics_sum: Dict[str, jnp.ndarray] = {}
        total_w = 0.0
        # Python loop over the (static, small) number of slices.
        for start in range(0, b, mb):
            sl = jax.tree.map(lambda x: x[:, start : start + mb], batch)
            w = weights[:, start : start + mb]
            (_, m), g = grad_fn(params0, sl, w)
            grads = jax.tree.map(jnp.add, grads, g)
            wsum = w.sum() / weights.shape[0]
            total_w = total_w + wsum
            metrics_sum = {
                k: metrics_sum.get(k, 0.0) + v * wsum for k, v in m.items()
            }
        denom = jnp.maximum(total_w, 1e-8)
        metrics = {k: v / denom for k, v in metrics_sum.items()}
        updates, opt_state = self.optimizer.update(grads, opt_state, params0)
        params = optax.apply_updates(params0, updates)
        return {**variables, "params": params}, opt_state, metrics

    def _train(self, dataset: PreferenceDataset, epoch_multiplier: float = 1.0) -> None:
        if self.variables is None:
            raise RuntimeError("call .attach(reward_variables) first")
        train_batch_all, val_batch = self._split_dataset(dataset)
        n = int(train_batch_all.prefs.shape[0])
        M = self.num_members
        # Dataset-level bagging (reference :1408-1424): one independent
        # with-replacement resample of the training set per member per call.
        bag = self.rng.integers(0, n, size=(M, n))
        epochs = max(1, int(round(self.epochs * epoch_multiplier)))
        bs = min(self.batch_size, n)
        lam = jnp.asarray(
            self.regularizer.lambda_ if self.regularizer is not None else 0.0,
            jnp.float32,
        )
        rows = np.arange(M)[:, None]
        last_metrics: Dict[str, float] = {}
        for _ in range(epochs):
            perms = np.stack([self.rng.permutation(n) for _ in range(M)])
            for i in range(0, n, bs):
                sel = bag[rows, perms[:, i : i + bs]]  # [M, b_true]
                b_true = sel.shape[1]
                # Pad to [M, self.batch_size] with weight-0 rows: one static
                # jit shape regardless of dataset size.
                w = np.zeros((M, self.batch_size), np.float32)
                w[:, :b_true] = 1.0
                pad = np.zeros((M, self.batch_size - b_true), sel.dtype)
                idx = jnp.asarray(np.concatenate([sel, pad], axis=1))
                mb = jax.tree.map(lambda x: x[idx], train_batch_all)
                w_dev = jnp.asarray(w)
                if self.batch_sharding is not None:
                    # sample axis is axis 1 here ([member, sample, ...])
                    mb = jax.tree.map(
                        lambda x: jax.device_put(x, self.batch_sharding), mb
                    )
                    w_dev = jax.device_put(w_dev, self.batch_sharding)
                self.variables, self.opt_state, metrics = self._update_jit(
                    self.variables, self.opt_state, mb, w_dev, lam
                )
            last_metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
            for k, v in last_metrics.items():
                self.logger.record(k, v)
        if self.regularizer is not None and val_batch is not None:
            train_loss = self._eval_loss(self.variables, train_batch_all)
            val_loss = self._eval_loss(self.variables, val_batch)
            self.logger.record("val_loss", val_loss)
            self.regularizer.update_params(train_loss, val_loss)
        for k, v in last_metrics.items():
            self.logger.record(f"final/train/{k}", v)
        return last_metrics


def get_base_model(reward_model: RewardNet) -> RewardNet:
    """Unwraps nested reward nets to the base (reference :1441-1446)."""
    base_model = reward_model
    while hasattr(base_model, "base") and base_model.base is not None:
        base_model = base_model.base
    return base_model


def _make_reward_trainer(
    preference_model: PreferenceModel,
    loss: Optional[RewardLoss] = None,
    rng: Union[int, np.random.Generator] = 0,
    reward_trainer_kwargs: Optional[Mapping[str, Any]] = None,
) -> RewardTrainer:
    """Builds the right trainer for the model type (reference :1449-1472)."""
    kwargs = dict(reward_trainer_kwargs or {})
    if preference_model.is_ensemble:
        return EnsembleTrainer(preference_model, loss=loss, rng=rng, **kwargs)
    return BasicRewardTrainer(preference_model, loss=loss, rng=rng, **kwargs)


QUERY_SCHEDULES: Dict[str, Callable[[float], float]] = {
    "constant": lambda t: 1.0,
    "hyperbolic": lambda t: 1.0 / (1.0 + t),
    "inverse_quadratic": lambda t: 1.0 / (1.0 + t**2),
}


# ---------------------------------------------------------------------------
# Orchestrator
# ---------------------------------------------------------------------------


class PreferenceComparisons(base.BaseImitationAlgorithm):
    """Main RLHF interface (reference :1482-1753)."""

    def __init__(
        self,
        trajectory_generator: TrajectoryGenerator,
        reward_model: RewardNet,
        num_iterations: int,
        fragmenter: Optional[Fragmenter] = None,
        preference_gatherer: Optional[PreferenceGatherer] = None,
        reward_trainer: Optional[RewardTrainer] = None,
        comparison_queue_size: Optional[int] = None,
        fragment_length: int = 100,
        transition_oversampling: float = 1.0,
        initial_comparison_frac: float = 0.1,
        initial_epoch_multiplier: float = 200.0,
        custom_logger: Optional[HierarchicalLogger] = None,
        allow_variable_horizon: bool = False,
        rng: Union[int, np.random.Generator] = 0,
        query_schedule: Union[str, Callable[[float], float]] = "hyperbolic",
        reward_variables: Any = None,
        seed: int = 0,
    ):
        super().__init__(
            custom_logger=custom_logger,
            allow_variable_horizon=allow_variable_horizon,
        )
        rng = rng if isinstance(rng, np.random.Generator) else np.random.default_rng(rng)
        self.rng = rng
        self.model = reward_model
        self.reward_variables = (
            reward_variables
            if reward_variables is not None
            else reward_model.init_variables(jax.random.key(seed))
        )
        self.trajectory_generator = trajectory_generator
        self.trajectory_generator.logger = self.logger
        self.fragmenter = fragmenter or RandomFragmenter(rng=rng)
        self.fragmenter.logger = self.logger
        self.preference_gatherer = preference_gatherer or SyntheticGatherer(rng=rng)
        self.preference_gatherer.logger = self.logger
        preference_model = PreferenceModel(reward_model)
        self.reward_trainer = reward_trainer or _make_reward_trainer(
            preference_model, rng=rng
        )
        self.reward_trainer.attach(self.reward_variables)
        self.reward_trainer.logger = self.logger
        self.num_iterations = num_iterations
        self.fragment_length = fragment_length
        self.transition_oversampling = transition_oversampling
        if not (0 <= initial_comparison_frac <= 1):
            raise ValueError("initial_comparison_frac must lie in [0, 1]")
        self.initial_comparison_frac = initial_comparison_frac
        self.initial_epoch_multiplier = initial_epoch_multiplier
        self.dataset = PreferenceDataset(max_size=comparison_queue_size)
        self._iteration = 0
        if callable(query_schedule):
            self.query_schedule = query_schedule
        elif query_schedule in QUERY_SCHEDULES:
            self.query_schedule = QUERY_SCHEDULES[query_schedule]
        else:
            raise ValueError(f"Unknown query schedule: {query_schedule}")

    def train(
        self,
        total_timesteps: int,
        total_comparisons: int,
        callback: Optional[Callable[[int], None]] = None,
    ) -> Mapping[str, Any]:
        """The DRLHP loop (reference :1656-1753)."""
        initial_comparisons = int(total_comparisons * self.initial_comparison_frac)
        total_comparisons -= initial_comparisons
        vec_schedule = np.vectorize(self.query_schedule)
        unnormalized_probs = vec_schedule(np.linspace(0, 1, self.num_iterations))
        probs = unnormalized_probs / np.sum(unnormalized_probs)
        shares = util.oric(probs * total_comparisons)
        schedule = [initial_comparisons] + shares.tolist()
        self.logger.info(f"Query schedule: {schedule}")

        timesteps_per_iteration, extra_timesteps = divmod(
            total_timesteps, self.num_iterations
        )
        reward_loss = None
        reward_accuracy = None

        for i, num_pairs in enumerate(schedule):
            # Gather new preferences.
            num_steps = math.ceil(
                self.transition_oversampling * 2 * num_pairs * self.fragment_length,
            )
            self.logger.info(
                f"Collecting {2 * num_pairs} fragments ({num_steps} transitions)"
            )
            trajectories = self.trajectory_generator.sample(num_steps)
            horizons = (len(traj) for traj in trajectories if traj.terminal)
            self._check_fixed_horizon(horizons)
            if hasattr(self.fragmenter, "variables"):
                self.fragmenter.variables = self.reward_variables
            fragments = self.fragmenter(
                trajectories, self.fragment_length, num_pairs
            )
            with self.logger.accumulate_means("preferences"):
                preferences = self.preference_gatherer(fragments)
            self.dataset.push(fragments, preferences)
            self.logger.info(f"Dataset now contains {len(self.dataset)} comparisons")

            # Train reward model (longer on the first iteration).
            epoch_multiplier = (
                self.initial_epoch_multiplier if i == 0 else 1.0
            )
            train_metrics = self.reward_trainer.train(
                self.dataset, epoch_multiplier=epoch_multiplier
            )
            self.reward_variables = self.reward_trainer.variables
            reward_loss = train_metrics.get("loss")
            reward_accuracy = train_metrics.get("accuracy")

            # Train the agent on the fresh reward.
            num_steps = timesteps_per_iteration
            if i == self.num_iterations - 1:
                num_steps += extra_timesteps
            if hasattr(self.trajectory_generator, "reward_variables"):
                self.trajectory_generator.reward_variables = self.reward_variables
            with self.logger.accumulate_means("agent"):
                self.logger.info(f"Training agent for {num_steps} timesteps")
                self.trajectory_generator.train(steps=num_steps)
            # Relabel-time normalizer-stats updates flow back (params are
            # untouched by the generator, so the trainer's opt_state stays
            # valid).
            gen_vars = getattr(self.trajectory_generator, "reward_variables", None)
            if gen_vars is not None:
                self.reward_variables = gen_vars
                self.reward_trainer.variables = gen_vars

            self.logger.dump(self._iteration)
            if callback:
                callback(self._iteration)
            self._iteration += 1

        return {"reward_loss": reward_loss, "reward_accuracy": reward_accuracy}

"""DAgger: Dataset Aggregation (Ross et al. 2011).

Counterpart of reference ``algorithms/dagger.py`` (694 LoC). Round-based:
collect demonstrations with a beta-mixture of expert and robot actions, then
run BC on all demonstrations gathered so far.

Key semantics preserved:

* ``LinearBetaSchedule`` (rampdown over 15 rounds) / ``ExponentialBetaSchedule``
  (reference dagger.py:28-96).
* Per-env, per-step Bernoulli(1-beta) substitution of ROBOT actions into the
  stepped action, while the saved demonstration always records the EXPERT
  action (reference InteractiveTrajectoryCollector dagger.py:257-283) — here
  the mixture is a pure policy function whose rollout aux carries the expert
  action, so collection stays one jitted scan.
* Each round's demos are written to ``{scratch_dir}/demos/round-XXX``
  (reference dagger.py:130-148) and BC retrains on ALL rounds so far with
  ``DEFAULT_N_EPOCHS = 4`` (reference dagger.py:443-497).
"""

from __future__ import annotations

import abc
import dataclasses
import os
import pathlib
from typing import Any, Callable, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from imitation_tpu.algorithms import base
from imitation_tpu.algorithms.bc import BC
from imitation_tpu.data import rollout as rollout_mod
from imitation_tpu.data import serialize, types
from imitation_tpu.envs.vector import VectorEnv
from imitation_tpu.util.logger import HierarchicalLogger

DEFAULT_N_EPOCHS: int = 4  # reference dagger.py DEFAULT_N_EPOCHS


class BetaSchedule(abc.ABC):
    """Computes beta (probability of using expert action) per round
    (reference dagger.py:28-50)."""

    @abc.abstractmethod
    def __call__(self, round_num: int) -> float:
        ...


class LinearBetaSchedule(BetaSchedule):
    """beta linearly ramping from 1 to 0 over ``rampdown_rounds``
    (reference dagger.py:53-76)."""

    def __init__(self, rampdown_rounds: int = 15):
        self.rampdown_rounds = rampdown_rounds

    def __call__(self, round_num: int) -> float:
        assert round_num >= 0
        return min(1.0, max(0.0, (self.rampdown_rounds - round_num) / self.rampdown_rounds))


class ExponentialBetaSchedule(BetaSchedule):
    """beta = decay_probability ** round (reference dagger.py:79-96)."""

    def __init__(self, decay_probability: float):
        if not (0 <= decay_probability <= 1):
            raise ValueError("decay_probability lies outside the range [0, 1].")
        self.decay_probability = decay_probability

    def __call__(self, round_num: int) -> float:
        assert round_num >= 0
        return self.decay_probability**round_num


def reconstruct_trainer(
    scratch_dir: str,
    venv: VectorEnv,
    custom_logger: Optional[HierarchicalLogger] = None,
) -> "DAggerTrainer":
    """Reconstructs a saved DAggerTrainer (reference dagger.py:99-127)."""
    import cloudpickle

    checkpoint_path = pathlib.Path(scratch_dir, "checkpoint-latest.pkl")
    with open(checkpoint_path, "rb") as f:
        trainer = cloudpickle.load(f)
    trainer.venv = venv
    trainer._logger = custom_logger or trainer._logger
    return trainer


def _save_dagger_demo(
    trajectory: types.TrajectoryWithRew,
    trajectory_index: int,
    save_dir: str,
    prefix: str = "",
) -> None:
    """Saves one demo trajectory (reference dagger.py:130-148)."""
    save_dir = pathlib.Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    actual_prefix = f"{prefix}-" if prefix else ""
    npz_path = save_dir / f"{actual_prefix}dagger-demo-{trajectory_index}"
    serialize.save(str(npz_path), [trajectory])


class NeedsDemosException(Exception):
    """Demos need to be collected before training (reference dagger.py:291)."""


class InteractiveTrajectoryCollector:
    """Collects beta-mixture rollouts, recording expert actions.

    Functional replacement for the reference's VecEnv wrapper
    (reference dagger.py:151-287): ``collect_trajectories`` runs jitted
    rollout scans where the stepped action is the expert's with probability
    beta (per env per step, reference :257-259), while the demonstration
    records the expert action always (reference :277-283). Finished demos
    are saved to ``save_dir``.
    """

    def __init__(
        self,
        venv: VectorEnv,
        robot_policy_apply,
        robot_variables,
        beta: float,
        save_dir: str,
        rng: np.random.Generator,
    ):
        self.venv = venv
        self.robot_policy_apply = robot_policy_apply
        self.robot_variables = robot_variables
        self.beta = beta
        self.save_dir = save_dir
        self.rng = rng
        self.traj_index = 0

    def _mixture_policy_apply(self, expert_apply):
        beta = self.beta
        robot_apply = self.robot_policy_apply

        # Both parameter sets travel as the `params` ARGUMENT of the
        # collector's jitted apply — closing over the robot variables would
        # bake device arrays into the program as constants (slow fetch at
        # lowering on remote TPU backends; recompile every round when BC
        # updates them).
        def apply(params, obs, key):
            expert_params, robot_variables = params
            k_e, k_r, k_mix = jax.random.split(key, 3)
            expert_acts, _ = expert_apply(expert_params, obs, k_e)
            robot_acts, _ = robot_apply(robot_variables, obs, k_r)
            B = jax.tree.leaves(obs)[0].shape[0]
            use_expert = jax.random.uniform(k_mix, (B,)) < beta
            mask = use_expert.reshape((B,) + (1,) * (expert_acts.ndim - 1))
            acts = jnp.where(mask, expert_acts, robot_acts)
            return acts, {"expert_acts": expert_acts}

        return apply

    def collect_trajectories(
        self,
        expert_apply,
        expert_params,
        sample_until: rollout_mod.GenTrajTerminationFn,
        *,
        chunk_size: int = 128,
        seed: int = 0,
    ) -> Sequence[types.TrajectoryWithRew]:
        """Rolls out the mixture; returns + saves expert-labeled demos."""
        mixture = self._mixture_policy_apply(expert_apply)
        accum = rollout_mod.TrajectoryAccumulator(self.venv.num_envs)
        collected: List[types.TrajectoryWithRew] = []
        if getattr(self.venv, "is_host", False):
            # Host (gym-bridge) envs: env steps on host, mixture policy
            # jitted per step.
            collector = rollout_mod.HostCollector(
                self.venv, mixture, (expert_params, self.robot_variables),
                seed=seed,
            )
            while not sample_until(collected):
                chunk = collector.collect(chunk_size)
                demo_chunk = chunk.replace(acts=chunk.aux["expert_acts"])
                collected.extend(accum.add_chunk(demo_chunk))
        else:
            key = jax.random.key(seed)
            key, k_reset = jax.random.split(key)
            state = self.venv.reset(k_reset)
            collect_jit = jax.jit(rollout_mod.collect, static_argnums=(0, 1, 4))
            while not sample_until(collected):
                key, sub = jax.random.split(key)
                state, chunk = collect_jit(
                    self.venv, mixture, (expert_params, self.robot_variables),
                    state, chunk_size, sub,
                )
                # Demonstrations record the EXPERT action, not the stepped one.
                demo_chunk = chunk.replace(acts=chunk.aux["expert_acts"])
                collected.extend(accum.add_chunk(demo_chunk))
        for traj in collected:
            _save_dagger_demo(traj, self.traj_index, self.save_dir)
            self.traj_index += 1
        return collected


class DAggerTrainer(base.BaseImitationAlgorithm):
    """Low-level round-based DAgger API (reference dagger.py:294-549)."""

    _all_demos: List[types.TrajectoryWithRew]

    DEFAULT_N_EPOCHS: int = DEFAULT_N_EPOCHS

    def __init__(
        self,
        *,
        venv: VectorEnv,
        scratch_dir: Union[str, os.PathLike],
        rng: Union[int, np.random.Generator] = 0,
        beta_schedule: Optional[BetaSchedule] = None,
        bc_trainer: Optional[BC] = None,
        custom_logger: Optional[HierarchicalLogger] = None,
    ):
        super().__init__(custom_logger=custom_logger)
        if beta_schedule is None:
            beta_schedule = LinearBetaSchedule(15)
        self.beta_schedule = beta_schedule
        self.scratch_dir = pathlib.Path(scratch_dir)
        self.venv = venv
        self.round_num = 0
        self._last_loaded_round = -1
        self._all_demos = []
        self.rng = (
            rng if isinstance(rng, np.random.Generator) else np.random.default_rng(rng)
        )
        if bc_trainer is None:
            bc_trainer = BC(
                observation_space=venv.observation_space,
                action_space=venv.action_space,
                rng=int(self.rng.integers(0, 2**31 - 1)),
            )
        self.bc_trainer = bc_trainer
        self.bc_trainer.logger = self.logger

    @property
    def policy(self):
        return self.bc_trainer.policy

    @property
    def policy_variables(self):
        return self.bc_trainer.state.variables

    @property
    def batch_size(self) -> int:
        return self.bc_trainer.batch_size

    def _demo_dir_path_for_round(self, round_num: Optional[int] = None) -> pathlib.Path:
        if round_num is None:
            round_num = self.round_num
        return self.scratch_dir / "demos" / f"round-{round_num:03d}"

    def _try_load_demos(self) -> None:
        """Loads demos from rounds not yet ingested (reference dagger.py:423-453)."""
        demo_dir = self._demo_dir_path_for_round()
        demo_paths = (
            sorted(p for p in demo_dir.iterdir() if p.is_dir())
            if demo_dir.is_dir()
            else []
        )
        if len(demo_paths) == 0:
            raise NeedsDemosException(
                f"No demos found for round {self.round_num} in dir '{demo_dir}'. "
                f"Maybe you need to collect some demos? See "
                f".create_trajectory_collector()",
            )
        if self._last_loaded_round < self.round_num:
            for r in range(self._last_loaded_round + 1, self.round_num + 1):
                rdir = self._demo_dir_path_for_round(r)
                if not rdir.is_dir():
                    continue
                for p in sorted(q for q in rdir.iterdir() if q.is_dir()):
                    self._all_demos.extend(serialize.load(str(p)))
            self._last_loaded_round = self.round_num
        self._check_fixed_horizon(len(t) for t in self._all_demos)
        self.bc_trainer.set_demonstrations(self._all_demos)

    def extend_and_update(self, bc_train_kwargs: Optional[dict] = None) -> int:
        """Load new round demos, train BC, bump round (reference dagger.py:455-497)."""
        if bc_train_kwargs is None:
            bc_train_kwargs = {}
        user_keys = bc_train_kwargs.keys()
        if "log_rollouts_venv" not in user_keys:
            bc_train_kwargs["log_rollouts_venv"] = self.venv
        if "n_epochs" not in user_keys and "n_batches" not in user_keys:
            bc_train_kwargs["n_epochs"] = self.DEFAULT_N_EPOCHS
        self.logger.info("Loading demonstrations")
        self._try_load_demos()
        self.logger.info(f"Training at round {self.round_num}")
        self.bc_trainer.train(**bc_train_kwargs)
        self.round_num += 1
        self.logger.info(f"New round number is {self.round_num}")
        return self.round_num

    def create_trajectory_collector(self) -> InteractiveTrajectoryCollector:
        """Collector for the current round's beta (reference dagger.py:499-516)."""
        beta = self.beta_schedule(self.round_num)
        return InteractiveTrajectoryCollector(
            venv=self.venv,
            robot_policy_apply=self.bc_trainer.policy.sample_fn(),
            robot_variables=self.bc_trainer.state.variables,
            beta=beta,
            save_dir=str(self._demo_dir_path_for_round()),
            rng=self.rng,
        )

    def save_trainer(self) -> Tuple[pathlib.Path, pathlib.Path]:
        """Checkpoints trainer + policy (reference dagger.py:518-549)."""
        import cloudpickle

        self.scratch_dir.mkdir(parents=True, exist_ok=True)
        checkpoint_paths = [
            self.scratch_dir / f"checkpoint-{self.round_num:03d}.pkl",
            self.scratch_dir / "checkpoint-latest.pkl",
        ]
        venv, logger = self.venv, self._logger
        try:
            self.venv = None
            for path in checkpoint_paths:
                with open(path, "wb") as f:
                    cloudpickle.dump(self, f)
        finally:
            self.venv = venv
            self._logger = logger
        policy_paths = [
            self.scratch_dir / f"policy-{self.round_num:03d}",
            self.scratch_dir / "policy-latest",
        ]
        for path in policy_paths:
            self.bc_trainer.save_policy(str(path))
        return checkpoint_paths[1], policy_paths[1]


class SimpleDAggerTrainer(DAggerTrainer):
    """High-level DAgger loop with a synthetic expert
    (reference dagger.py:552-694)."""

    def __init__(
        self,
        *,
        venv: VectorEnv,
        scratch_dir: Union[str, os.PathLike],
        expert_policy_apply,
        expert_params: Any = None,
        rng: Union[int, np.random.Generator] = 0,
        expert_trajs: Optional[Sequence[types.Trajectory]] = None,
        **dagger_trainer_kwargs,
    ):
        super().__init__(
            venv=venv, scratch_dir=scratch_dir, rng=rng, **dagger_trainer_kwargs
        )
        self.expert_policy_apply = expert_policy_apply
        self.expert_params = expert_params
        if expert_trajs is not None:
            # Save pre-existing demos into round 0 (reference dagger.py:600-612).
            for traj_index, traj in enumerate(expert_trajs):
                _save_dagger_demo(
                    traj,
                    traj_index,
                    str(self._demo_dir_path_for_round()),
                    prefix="initial_data",
                )

    def train(
        self,
        total_timesteps: int,
        *,
        rollout_round_min_episodes: int = 3,
        rollout_round_min_timesteps: int = 500,
        bc_train_kwargs: Optional[dict] = None,
        on_round_end: Optional[Callable[[int, int], None]] = None,
    ) -> None:
        """Alternates collection and BC (reference dagger.py:615-694).

        ``on_round_end(round_num, total_timestep_count)``, if given, runs
        after each round's BC update — used by benchmark drivers to record
        intermediate evaluations so an interrupted run still yields a
        learning curve.
        """
        total_timestep_count = 0
        round_num = 0
        while total_timestep_count < total_timesteps:
            collector = self.create_trajectory_collector()
            round_episode_count = 0
            round_timestep_count = 0
            sample_until = rollout_mod.make_sample_until(
                min_timesteps=max(rollout_round_min_timesteps, self.batch_size),
                min_episodes=rollout_round_min_episodes,
            )
            trajectories = collector.collect_trajectories(
                self.expert_policy_apply,
                self.expert_params,
                sample_until,
                seed=int(self.rng.integers(0, 2**31 - 1)),
            )
            for traj in trajectories:
                self._logger.record_mean(
                    "dagger/mean_episode_reward", float(np.sum(traj.rews))
                )
                round_timestep_count += len(traj)
                total_timestep_count += len(traj)
            round_episode_count += len(trajectories)
            self._logger.record("dagger/total_timesteps", total_timestep_count)
            self._logger.record("dagger/round_num", round_num)
            self._logger.record("dagger/round_episode_count", round_episode_count)
            self._logger.record("dagger/round_timestep_count", round_timestep_count)
            self.extend_and_update(bc_train_kwargs)
            round_num += 1
            if on_round_end is not None:
                on_round_end(round_num, total_timestep_count)

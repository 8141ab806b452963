"""Rollout collection: device-side scan engine + host-side trajectory API.

Two layers:

* ``collect`` — the TPU hot loop. One ``lax.scan`` steps a VectorEnv with a
  policy for T steps, producing a fixed-shape ``RolloutChunk`` of [T, B]
  arrays entirely in HBM. PPO, GAIL, AIRL, preference comparisons and DAgger
  all ride this one scan; reward relabeling (the reference's
  ``RewardVecEnvWrapper``, src/imitation/rewards/reward_wrapper.py:40-133)
  is a fused post-map over the chunk, not a per-step host call.

* ``generate_trajectories`` / ``rollout`` / ``generate_transitions`` — host
  API matching the reference's rollout interface (reference:
  src/imitation/data/rollout.py:382-757): collect complete episodes until a
  ``sample_until`` condition, convert to variable-length host ``Trajectory``
  objects, with the same shape sanity checks and unbiased episode-sampling
  semantics (trajectories are shuffled before truncation so completing-first
  short episodes are not over-represented; reference rollout.py:434-472).
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Mapping, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from imitation_tpu.data import types
from imitation_tpu.envs.vector import VecEnvState, VecStep, VectorEnv

# A policy for rollout purposes: (params, obs[B,...], key) -> (acts[B,...], aux)
# aux is an arbitrary pytree (e.g. log_prob, value) recorded per step.
PolicyApply = Callable[[Any, Any, jax.Array], Tuple[jnp.ndarray, Any]]

GenTrajTerminationFn = Callable[[Sequence[types.TrajectoryWithRew]], bool]


@struct.dataclass
class RolloutChunk:
    """[T, B]-shaped result of a rollout scan (device-resident)."""

    obs: Any  # [T, B, ...] obs the action was computed from
    acts: jnp.ndarray  # [T, B, ...]
    rews: jnp.ndarray  # [T, B]
    next_obs: Any  # [T, B, ...] true next obs (terminal_obs at episode ends)
    terminated: jnp.ndarray  # [T, B] bool
    truncated: jnp.ndarray  # [T, B] bool
    episode_return: jnp.ndarray  # [T, B] valid where done
    episode_length: jnp.ndarray  # [T, B] valid where done
    aux: Any  # [T, B, ...] policy aux (log_prob, value, ...)

    @property
    def dones(self) -> jnp.ndarray:
        return jnp.logical_or(self.terminated, self.truncated)

    @property
    def num_steps(self) -> int:
        return self.acts.shape[0]

    @property
    def num_envs(self) -> int:
        return self.acts.shape[1]


def collect(
    venv: VectorEnv,
    policy_apply: PolicyApply,
    params: Any,
    state: VecEnvState,
    num_steps: int,
    key: jax.Array,
) -> Tuple[VecEnvState, RolloutChunk]:
    """Scans ``num_steps`` of policy+env interaction. Pure; jit-able.

    The returned chunk's ``next_obs`` at done steps is the *terminal*
    observation — reward relabeling over the chunk therefore sees the same
    (s, a, s', done) tuples the reference's RewardVecEnvWrapper reconstructs
    from ``info["terminal_observation"]``.
    """

    def step_fn(carry, step_key):
        env_state = carry
        obs = env_state.obs
        k_act, _ = jax.random.split(step_key)
        acts, aux = policy_apply(params, obs, k_act)
        env_state, out = venv.step(env_state, acts)
        rec = RolloutChunk(
            obs=obs,
            acts=acts,
            rews=out.reward,
            next_obs=out.terminal_obs,
            terminated=out.terminated,
            truncated=out.truncated,
            episode_return=out.episode_return,
            episode_length=out.episode_length,
            aux=aux,
        )
        return env_state, rec

    keys = jax.random.split(key, num_steps)
    state, chunk = jax.lax.scan(step_fn, state, keys)
    return state, chunk


# ---------------------------------------------------------------------------
# Termination conditions (host-side, reference rollout.py:190-285)
# ---------------------------------------------------------------------------


class HostCollector:
    """Rollout collection for host (gym-bridge) vector envs.

    The policy apply stays jitted on device; only env stepping happens on
    host — the same split as the reference's SB3 collect loop, but with the
    policy batched over all envs in one device call per step.
    """

    def __init__(self, venv, policy_apply: PolicyApply, params: Any, seed: int = 0):
        self.venv = venv
        # Policies marked ``host_stateful`` (e.g. the exploration wrapper's
        # host fn) carry Python-side per-env state that must execute every
        # step — they are called eagerly, never wrapped in jit (a jitted
        # closure would only run its Python at trace time).
        self._stateful = bool(getattr(policy_apply, "host_stateful", False))
        self._apply = policy_apply if self._stateful else jax.jit(policy_apply)

        # One fused dispatch per env step: fold the RNG split into the
        # jitted call (a bare jax.random.split is its own ~0.3ms dispatch
        # on the CPU backend, comparable to the MLP forward itself).
        def _step_apply(params, obs, key):
            key, k_act = jax.random.split(key)
            acts, aux = policy_apply(params, obs, k_act)
            return acts, aux, key

        self._step_apply = None if self._stateful else jax.jit(_step_apply)
        self.params = params
        # Pin the per-step policy forward to the LOCAL CPU: with a remote /
        # tunneled accelerator, a device call per env step costs a network
        # round trip each way, which dwarfs the MLP forward. Collection
        # runs on CPU; the finished chunk moves to the accelerator once.
        self._cpu = None
        if jax.default_backend() != "cpu":
            try:
                self._cpu = jax.local_devices(backend="cpu")[0]
            except RuntimeError:
                self._cpu = None
        if self._cpu is not None:
            # Create the key ON the CPU backend. A cross-backend
            # `device_put` (accelerator -> host CPU backend) deadlocks on
            # remote/tunneled TPU plugins; `device_get` + fresh host arrays
            # are the safe direction.
            with jax.default_device(self._cpu):
                self.key = jax.random.key(seed)
        else:
            self.key = jax.random.key(seed)
        self.obs = venv.reset(seed=seed)
        self._cpu_params = None
        self._cpu_params_src = None

    def reseed(self, seed: int) -> None:
        """Resets the env + RNG for a fresh collection pass (collector reuse)."""
        if self._cpu is not None:
            with jax.default_device(self._cpu):
                self.key = jax.random.key(seed)
        else:
            self.key = jax.random.key(seed)
        self.obs = self.venv.reset(seed=seed)

    def _params_for_apply(self):
        # Cache a SNAPSHOT of the params; refresh when the trainer swaps in
        # new ones. The snapshot (a host copy even on the CPU backend, not
        # a reference to the live buffers) is what makes the overlapped
        # host-collection paths donation-safe: trainers call this
        # synchronously before dispatching a device update, so even if an
        # update jit donates/invalidates the old param buffers, the
        # background collect thread reads this decoupled copy.
        if self._cpu_params_src is not self.params:
            if self._cpu is None:
                self._cpu_params = jax.tree.map(
                    lambda a: np.array(a), self.params
                )
            else:
                # device_get then re-put: direct accelerator->CPU-backend
                # device_put deadlocks on remote TPU plugins (see __init__).
                host = jax.device_get(self.params)
                self._cpu_params = jax.tree.map(
                    lambda a: jax.device_put(np.asarray(a), self._cpu), host
                )
            self._cpu_params_src = self.params
        return self._cpu_params

    def collect(self, num_steps: int) -> RolloutChunk:
        recs = {k: [] for k in (
            "obs", "acts", "rews", "next_obs", "terminated", "truncated",
            "episode_return", "episode_length",
        )}
        aux_recs: list = []
        params = self._params_for_apply()
        key = self.key
        if self._stateful:
            # Eager path: pre-split per-step keys once (cheap), call the
            # stateful policy directly so its host state advances per step.
            step_keys = jax.random.split(key, num_steps + 1)
            key = step_keys[0]
        for i in range(num_steps):
            if self._stateful:
                acts, aux = self._apply(
                    params, np.asarray(self.obs), step_keys[i + 1]
                )
            else:
                acts, aux, key = self._step_apply(
                    params, np.asarray(self.obs), key
                )
            acts = np.asarray(acts)
            out = self.venv.step(acts)
            recs["obs"].append(self.obs)
            recs["acts"].append(acts)
            recs["rews"].append(out["reward"])
            recs["next_obs"].append(out["terminal_obs"])
            recs["terminated"].append(out["terminated"])
            recs["truncated"].append(out["truncated"])
            recs["episode_return"].append(out["episode_return"])
            recs["episode_length"].append(out["episode_length"])
            aux_recs.append(aux)
            self.obs = out["obs"]
        self.key = key
        aux_recs = jax.device_get(aux_recs)
        stacked = {k: np.stack(v) for k, v in recs.items()}
        if aux_recs and isinstance(aux_recs[0], dict) and aux_recs[0]:
            aux_stacked = {
                k: jnp.asarray(np.stack([a[k] for a in aux_recs]))
                for k in aux_recs[0]
            }
        else:
            aux_stacked = {}
        return RolloutChunk(
            aux=aux_stacked, **{k: jnp.asarray(v) for k, v in stacked.items()}
        )


def generate_trajectories_host(
    policy_apply: PolicyApply,
    params: Any,
    venv,
    sample_until: GenTrajTerminationFn,
    rng,
    *,
    chunk_size: int = 128,
) -> Sequence[types.TrajectoryWithRew]:
    """Host-env twin of generate_trajectories (gym-bridge path)."""
    seed = int(rng) if isinstance(rng, (int, np.integer)) else int(
        np.random.default_rng().integers(0, 2**31 - 1)
    )
    # Reuse one collector per (venv, policy fn): HostCollector jits its
    # per-step apply per instance, so rebuilding it every call (e.g. the
    # periodic evals inside a training loop) would retrace + recompile the
    # policy forward each time.
    cached = getattr(venv, "_gen_traj_collector", None)
    if cached is not None and cached[0] is policy_apply:
        collector = cached[1]
        collector.params = params
        collector.reseed(seed)
    else:
        collector = HostCollector(venv, policy_apply, params, seed=seed)
        venv._gen_traj_collector = (policy_apply, collector)
    accum = TrajectoryAccumulator(venv.num_envs)
    trajectories: list = []
    while not sample_until(trajectories):
        chunk = collector.collect(chunk_size)
        trajectories.extend(accum.add_chunk(chunk))
    perm = np.random.default_rng(seed).permutation(len(trajectories))
    return [trajectories[i] for i in perm]


def chunk_to_transitions(chunk: RolloutChunk) -> types.TransitionBatch:
    """Flattens a [T, B] rollout chunk into a [T*B] TransitionBatch (device)."""
    T, B = chunk.acts.shape[0], chunk.acts.shape[1]
    flat = lambda x: x.reshape((T * B,) + x.shape[2:])
    return types.TransitionBatch(
        obs=jax.tree.map(flat, chunk.obs),
        acts=flat(chunk.acts),
        next_obs=jax.tree.map(flat, chunk.next_obs),
        dones=flat(chunk.dones.astype(jnp.float32)),
        rews=flat(chunk.rews),
    )


def make_min_episodes(n: int) -> GenTrajTerminationFn:
    """Terminate after collecting n episodes (reference rollout.py:190-208)."""
    if n < 1:
        raise ValueError(f"n must be positive, got {n}")
    return lambda trajectories: len(trajectories) >= n


def make_min_timesteps(n: int) -> GenTrajTerminationFn:
    """Terminate after at least n timesteps (reference rollout.py:211-230)."""
    if n < 1:
        raise ValueError(f"n must be positive, got {n}")

    def f(trajectories: Sequence[types.TrajectoryWithRew]) -> bool:
        timesteps = sum(len(t) for t in trajectories)
        return timesteps >= n

    return f


def make_sample_until(
    min_timesteps: Optional[int] = None,
    min_episodes: Optional[int] = None,
) -> GenTrajTerminationFn:
    """AND-combination of timestep/episode conditions.

    Reference: src/imitation/data/rollout.py:233-285.
    """
    if min_timesteps is None and min_episodes is None:
        raise ValueError("At least one of min_timesteps and min_episodes must be provided")
    conditions = []
    if min_timesteps is not None:
        if min_timesteps < 1:
            raise ValueError(f"min_timesteps={min_timesteps} if provided must be positive")
        conditions.append(make_min_timesteps(min_timesteps))
    if min_episodes is not None:
        if min_episodes < 1:
            raise ValueError(f"min_episodes={min_episodes} if provided must be positive")
        conditions.append(make_min_episodes(min_episodes))

    def sample_until(trajs: Sequence[types.TrajectoryWithRew]) -> bool:
        return all(cond(trajs) for cond in conditions)

    return sample_until


# ---------------------------------------------------------------------------
# Host-side conversion: chunks -> trajectories
# ---------------------------------------------------------------------------


class TrajectoryAccumulator:
    """Accumulates per-env partial trajectories from host-side step data.

    Host counterpart of reference ``TrajectoryAccumulator``
    (src/imitation/data/rollout.py:57-187); used to cut [T, B] chunks into
    variable-length episodes.
    """

    def __init__(self, num_envs: int):
        self.partial = [[] for _ in range(num_envs)]  # per-env list of step dicts

    def add_step(self, env_idx: int, step: Mapping[str, Any]) -> None:
        self.partial[env_idx].append(dict(step))

    def finish_trajectory(self, env_idx: int, terminal: bool) -> types.TrajectoryWithRew:
        steps = self.partial[env_idx]
        self.partial[env_idx] = []
        if not steps:
            raise ValueError(f"no steps accumulated for env {env_idx}")
        obs = types.stack_maybe_dictobs(
            [s["obs"] for s in steps] + [steps[-1]["next_obs"]]
        )
        acts = np.stack([s["acts"] for s in steps])
        rews = np.stack([s["rews"] for s in steps]).astype(np.float64)
        infos = np.array([s.get("infos", {}) for s in steps])
        return types.TrajectoryWithRew(
            obs=obs, acts=acts, rews=rews, infos=infos, terminal=terminal
        )

    def add_chunk(self, chunk: RolloutChunk) -> Sequence[types.TrajectoryWithRew]:
        """Feeds a device chunk; returns the episodes completed inside it."""
        obs = np.asarray(jax.device_get(chunk.obs))
        acts = np.asarray(jax.device_get(chunk.acts))
        rews = np.asarray(jax.device_get(chunk.rews))
        next_obs = np.asarray(jax.device_get(chunk.next_obs))
        terminated = np.asarray(jax.device_get(chunk.terminated))
        truncated = np.asarray(jax.device_get(chunk.truncated))
        T, B = acts.shape[0], acts.shape[1]
        finished = []
        for t in range(T):
            for b in range(B):
                self.add_step(
                    b,
                    dict(
                        obs=obs[t, b],
                        acts=acts[t, b],
                        rews=rews[t, b],
                        next_obs=next_obs[t, b],
                    ),
                )
                if terminated[t, b] or truncated[t, b]:
                    finished.append(self.finish_trajectory(b, bool(terminated[t, b])))
        return finished


def generate_trajectories(
    policy_apply: PolicyApply,
    params: Any,
    venv: VectorEnv,
    sample_until: GenTrajTerminationFn,
    rng: Union[int, jax.Array, np.random.Generator],
    *,
    chunk_size: int = 256,
    deterministic_policy: bool = False,
) -> Sequence[types.TrajectoryWithRew]:
    """Collects complete episodes until ``sample_until`` is satisfied.

    Device rollout runs in fixed-size jitted chunks; episode cutting happens
    on host between chunks. Completed trajectories are shuffled before being
    returned so truncation by the caller does not bias toward short episodes
    (reference: src/imitation/data/rollout.py:434-472).

    Host (gym-bridge) vector envs are dispatched to the host collector.
    """
    if getattr(venv, "is_host", False):
        return generate_trajectories_host(
            policy_apply, params, venv, sample_until, rng, chunk_size=chunk_size
        )
    if isinstance(rng, np.random.Generator):
        seed = int(rng.integers(0, 2**31 - 1))
    elif isinstance(rng, (int, np.integer)):
        seed = int(rng)
        rng = np.random.default_rng(seed)
    else:
        seed = int(jax.random.randint(rng, (), 0, 2**31 - 1))
        rng = np.random.default_rng(seed)
    key = jax.random.key(seed)

    key, reset_key = jax.random.split(key)
    state = venv.reset(reset_key)
    accum = TrajectoryAccumulator(venv.num_envs)
    trajectories = []

    collect_jit = jax.jit(collect, static_argnums=(0, 1, 4))
    debug_timing = bool(os.environ.get("IMITATION_TPU_DEBUG_TIMING"))
    while not sample_until(trajectories):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter() if debug_timing else 0.0
        state, chunk = collect_jit(venv, policy_apply, params, state, chunk_size, sub)
        if debug_timing:
            print(f"[rollout] dispatch {time.perf_counter()-t0:.2f}s", flush=True)
            t0 = time.perf_counter()
        trajectories.extend(accum.add_chunk(chunk))
        if debug_timing:
            print(f"[rollout] fetch+cut {time.perf_counter()-t0:.2f}s", flush=True)

    # Shuffle for unbiased truncation by callers.
    perm = rng.permutation(len(trajectories))
    trajectories = [trajectories[i] for i in perm]

    # Sanity check shapes (reference rollout.py:483-504).
    obs_space = venv.observation_space
    for trajectory in trajectories:
        n_steps = len(trajectory.acts)
        if not isinstance(trajectory.obs, types.DictObs):
            exp_obs = (n_steps + 1,) + obs_space.shape
            real_obs = trajectory.obs.shape
            assert real_obs == exp_obs, f"expected shape {exp_obs}, got {real_obs}"
        exp_rew = (n_steps,)
        real_rew = trajectory.rews.shape
        assert real_rew == exp_rew, f"expected shape {exp_rew}, got {real_rew}"
    return trajectories


def rollout(
    policy_apply: PolicyApply,
    params: Any,
    venv: VectorEnv,
    sample_until: GenTrajTerminationFn,
    rng,
    *,
    unwrap: bool = False,
    verbose: bool = False,
    **kwargs,
) -> Sequence[types.TrajectoryWithRew]:
    """Generate + optionally log stats (reference rollout.py:668-725)."""
    trajs = generate_trajectories(policy_apply, params, venv, sample_until, rng, **kwargs)
    if verbose:
        stats = rollout_stats(trajs)
        print(f"Rollout stats: {stats}")
    return trajs


def generate_transitions(
    policy_apply: PolicyApply,
    params: Any,
    venv: VectorEnv,
    n_timesteps: int,
    rng,
    *,
    truncate: bool = True,
    **kwargs,
) -> types.TransitionsWithRew:
    """Generate obs-action-next_obs-reward tuples (reference rollout.py:624-665)."""
    traj = generate_trajectories(
        policy_apply, params, venv, make_min_timesteps(n_timesteps), rng, **kwargs
    )
    transitions = flatten_trajectories_with_rew(traj)
    if truncate and n_timesteps is not None:
        as_dict = types.dataclass_quick_asdict(transitions)
        truncated = {k: arr[:n_timesteps] for k, arr in as_dict.items()}
        truncated["obs"] = types.maybe_unwrap_dictobs(truncated["obs"])
        truncated["next_obs"] = types.maybe_unwrap_dictobs(truncated["next_obs"])
        transitions = types.TransitionsWithRew(**truncated)
    return transitions


# ---------------------------------------------------------------------------
# Flattening + stats (reference rollout.py:509-626, 728-757)
# ---------------------------------------------------------------------------


def flatten_trajectories(
    trajectories: Sequence[types.Trajectory],
) -> types.Transitions:
    """Flatten trajectories into transitions (reference rollout.py:563-610)."""

    def all_of_type(key, desired_type):
        return all(isinstance(getattr(traj, key), desired_type) for traj in trajectories)

    assert all_of_type("obs", (types.DictObs, np.ndarray))
    assert all_of_type("acts", np.ndarray)

    keys = ["obs", "next_obs", "acts", "dones", "infos"]
    parts: Mapping[str, list] = {key: [] for key in keys}
    for traj in trajectories:
        parts["acts"].append(traj.acts)
        obs = traj.obs
        parts["obs"].append(obs[:-1])
        parts["next_obs"].append(obs[1:])
        dones = np.zeros(len(traj.acts), dtype=bool)
        dones[-1] = traj.terminal
        parts["dones"].append(dones)
        if traj.infos is None:
            infos = np.array([{}] * len(traj))
        else:
            infos = traj.infos
        parts["infos"].append(infos)
    cat_parts = {
        key: types.concatenate_maybe_dictobs(part_list)
        if key in ("obs", "next_obs")
        else np.concatenate(part_list)
        for key, part_list in parts.items()
    }
    lengths = set(map(len, cat_parts.values()))
    assert len(lengths) == 1, f"expected one length, got {lengths}"
    return types.Transitions(
        obs=types.maybe_unwrap_dictobs(cat_parts["obs"]),
        acts=cat_parts["acts"],
        next_obs=types.maybe_unwrap_dictobs(cat_parts["next_obs"]),
        dones=cat_parts["dones"],
        infos=cat_parts["infos"],
    )


def flatten_trajectories_with_rew(
    trajectories: Sequence[types.TrajectoryWithRew],
) -> types.TransitionsWithRew:
    transitions = flatten_trajectories(trajectories)
    rews = np.concatenate([traj.rews for traj in trajectories])
    return types.TransitionsWithRew(
        **types.dataclass_quick_asdict(transitions),
        rews=rews,
    )


def rollout_stats(trajectories: Sequence[types.TrajectoryWithRew]) -> Mapping[str, float]:
    """Summary stats: return/len min/mean/std/max + monitor variants.

    Reference: src/imitation/data/rollout.py:509-560. ``monitor_return``
    reads the true env return recorded in ``info["rollout"]["rews"]`` — in
    our engine the monitor return is tracked natively, so when infos carry no
    monitor data the plain return doubles as the monitor return (our chunks
    record true env rewards; relabeled rollouts attach ``original_env_rew``).
    """
    assert len(trajectories) > 0
    out_stats = {"n_traj": len(trajectories)}
    traj_descriptors = {
        "return": np.asarray([np.sum(t.rews) for t in trajectories]),
        "len": np.asarray([len(t.rews) for t in trajectories]),
    }
    monitor_ep_returns = []
    for t in trajectories:
        if t.infos is not None and len(t.infos) > 0:
            ep_return = t.infos[-1].get("rollout", {}).get("monitor_return")
            if ep_return is not None:
                monitor_ep_returns.append(ep_return)
    if monitor_ep_returns:
        traj_descriptors["monitor_return"] = np.asarray(monitor_ep_returns)
        out_stats["monitor_return_len"] = len(monitor_ep_returns)
    else:
        traj_descriptors["monitor_return"] = traj_descriptors["return"]

    stat_names = ["min", "mean", "std", "max"]
    for desc_name, desc_vals in traj_descriptors.items():
        for stat_name in stat_names:
            stat_value = getattr(np, stat_name)(desc_vals)
            out_stats[f"{desc_name}_{stat_name}"] = float(stat_value)
    return out_stats


def discounted_sum(arr: np.ndarray, gamma: float) -> Union[np.ndarray, float]:
    """Discounted sum along axis 0 (reference rollout.py:728-757)."""
    if arr.ndim == 0:
        raise ValueError("arr must have at least one dimension")
    if gamma == 1.0:
        return arr.sum(axis=0)
    discounts = gamma ** np.arange(arr.shape[0])
    if arr.ndim == 1:
        return float(discounts @ arr)
    return np.tensordot(discounts, arr, axes=(0, 0))


def discounted_sum_jax(arr: jnp.ndarray, gamma: float, axis: int = 0) -> jnp.ndarray:
    """Device-side discounted sum along ``axis``."""
    n = arr.shape[axis]
    discounts = gamma ** jnp.arange(n, dtype=arr.dtype)
    shape = [1] * arr.ndim
    shape[axis] = n
    return jnp.sum(arr * discounts.reshape(shape), axis=axis)

"""DQN: off-policy Q-learning with replay and target network.

Replaces SB3's DQN as used by the reference (SQIL's default inner algorithm,
reference algorithms/sqil.py:26-102; rl ingredient scripts/ingredients/rl.py).

TPU-native structure: ``train_step`` is one jitted program that
  1. collects ``train_freq`` lockstep env steps with epsilon-greedy actions,
  2. scatters them into the on-device replay ring,
  3. runs ``gradient_steps`` TD updates on uniformly sampled batches,
  4. Polyak-updates the target network.
A ``sample_hook`` lets SQIL substitute its 50/50 expert/fresh sampling with
relabeled rewards without touching the update math.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from imitation_tpu.data.buffer import BufferState, ReplayBuffer
from imitation_tpu.data.types import TransitionBatch
from imitation_tpu.envs.vector import VecEnvState, VectorEnv
from imitation_tpu.rl import common


class QNetwork(nn.Module):
    n_actions: int
    hid_sizes: Tuple[int, ...] = (64, 64)

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> jnp.ndarray:
        x = obs.reshape((obs.shape[0], -1)).astype(jnp.float32)
        for i, h in enumerate(self.hid_sizes):
            x = nn.relu(nn.Dense(h, name=f"dense{i}")(x))
        return nn.Dense(self.n_actions, name="q_out")(x)


@dataclasses.dataclass
class DQNConfig:
    learning_rate: float = 1e-4
    buffer_size: int = 100_000
    learning_starts: int = 1000
    batch_size: int = 32
    tau: float = 1.0  # target polyak factor (1.0 = hard copy at target_update)
    gamma: float = 0.99
    train_freq: int = 4  # env steps (per env) per train_step collect
    gradient_steps: int = 1
    # In collected env steps, ACROSS all parallel envs. SB3's default is
    # 10000; too-frequent copies (e.g. 1000 steps / 8 envs = a copy every
    # ~30 gradient updates) let the bootstrap target chase the online net
    # and Q-values diverge (measured: q_mean 2000+ on CartPole, greedy
    # return ~10; at 10000, greedy return 196/200).
    target_update_interval: int = 10_000
    exploration_fraction: float = 0.1
    exploration_initial_eps: float = 1.0
    exploration_final_eps: float = 0.05
    max_grad_norm: float = 10.0
    hid_sizes: Tuple[int, ...] = (64, 64)
    # Host (gym-bridge) envs only: collect the next train_freq steps in a
    # background thread while the chip runs this round's TD updates
    # (one-round-stale behaviour policy; off-policy, so the replay math is
    # unchanged). See PPOConfig.overlap_collection for the same trade.
    overlap_collection: bool = False


@struct.dataclass
class DQNState:
    variables: Any
    target_params: Any
    opt_state: Any
    env_state: VecEnvState
    buffer_state: BufferState
    key: jax.Array
    timesteps: jnp.ndarray
    n_updates: jnp.ndarray


# Sample hook: (buffer, buffer_state, key, batch_size) -> TransitionBatch.
SampleHook = Callable[[ReplayBuffer, BufferState, jax.Array, int], TransitionBatch]


class DQN:
    """Deep Q-Network learner over a VectorEnv."""

    def __init__(
        self,
        venv: VectorEnv,
        config: DQNConfig = DQNConfig(),
        *,
        total_timesteps_hint: int = 100_000,
        sample_hook: Optional[SampleHook] = None,
        seed: int = 0,
    ):
        if not venv.action_space.is_discrete:
            raise ValueError("DQN requires a discrete action space")
        self.venv = venv
        self.config = config
        self.q_net = QNetwork(
            n_actions=venv.action_space.n, hid_sizes=tuple(config.hid_sizes)
        )
        self.optimizer = common.make_optimizer(
            config.learning_rate, config.max_grad_norm
        )
        self.replay = ReplayBuffer(config.buffer_size)
        self.sample_hook = sample_hook
        self._seed = seed
        # linear epsilon schedule over exploration_fraction * hint
        self._eps_decay_steps = max(
            1, int(config.exploration_fraction * total_timesteps_hint)
        )
        # Host (gym-bridge) envs take the PPO/SAC-style split: epsilon-greedy
        # stepping through a HostCollector, then the identical jitted
        # store+TD-update program per round.
        self.is_host_env = bool(getattr(venv, "is_host", False))
        self._host_collector = None
        self._pending_chunk = None
        self._collect_pool = None
        self.rebind()

    def rebind(self) -> None:
        """Re-jit after hooks (sample_hook) change."""
        if self.is_host_env:
            self._process_jit = jax.jit(self._process)
            self._train_step_jit = (
                self.train_step_host_overlapped
                if self.config.overlap_collection
                else self.train_step_host
            )
        else:
            self._train_step_jit = jax.jit(self.train_step)

    def _example_transitions(self) -> TransitionBatch:
        obs = jnp.zeros((1,) + self.venv.observation_space.shape, jnp.float32)
        return TransitionBatch(
            obs=obs,
            acts=jnp.zeros((1,), jnp.int32),
            next_obs=obs,
            dones=jnp.zeros((1,)),
            rews=jnp.zeros((1,)),
        )

    def init_state(self, key: Optional[jax.Array] = None) -> DQNState:
        key = key if key is not None else jax.random.key(self._seed)
        k_init, k_env, key = jax.random.split(key, 3)
        dummy = jnp.zeros((1,) + self.venv.observation_space.shape, jnp.float32)
        variables = self.q_net.init(k_init, dummy)
        if self.is_host_env:
            from imitation_tpu.data import rollout as rollout_mod

            env_state = None
            B = self.venv.num_envs
            n_actions = self.venv.action_space.n

            def eps_greedy(params_and_eps, obs, key):
                vs, eps = params_and_eps
                k_eps, k_unif = jax.random.split(key)
                q = self.q_net.apply(vs, obs)
                greedy = jnp.argmax(q, axis=-1).astype(jnp.int32)
                random_acts = jax.random.randint(k_unif, (B,), 0, n_actions)
                use_random = jax.random.uniform(k_eps, (B,)) < eps
                return jnp.where(use_random, random_acts, greedy), {}

            self._host_collector = rollout_mod.HostCollector(
                self.venv, eps_greedy,
                (variables, jnp.asarray(1.0)), seed=self._seed,
            )
        else:
            env_state = self.venv.reset(k_env)
        return DQNState(
            variables=variables,
            target_params=variables["params"],
            opt_state=self.optimizer.init(variables["params"]),
            env_state=env_state,
            buffer_state=self.replay.init_state(self._example_transitions()),
            key=key,
            timesteps=jnp.zeros((), jnp.int32),
            n_updates=jnp.zeros((), jnp.int32),
        )

    def epsilon(self, timesteps: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        frac = jnp.clip(timesteps / self._eps_decay_steps, 0.0, 1.0)
        return cfg.exploration_initial_eps + frac * (
            cfg.exploration_final_eps - cfg.exploration_initial_eps
        )

    def greedy_fn(self):
        """Deterministic argmax-Q rollout policy."""

        def f(variables, obs, key):
            q = self.q_net.apply(variables, obs)
            return jnp.argmax(q, axis=-1).astype(jnp.int32), {}

        return f

    def train_step(self, state: DQNState) -> Tuple[DQNState, Dict[str, jnp.ndarray]]:
        cfg = self.config
        B = self.venv.num_envs
        key, k_roll = jax.random.split(state.key)
        eps = self.epsilon(state.timesteps)

        # 1. Collect train_freq steps with epsilon-greedy.
        def step_fn(carry, step_key):
            env_state = carry
            obs = env_state.obs
            k_greedy, k_eps, k_unif = jax.random.split(step_key, 3)
            q = self.q_net.apply(state.variables, obs)
            greedy = jnp.argmax(q, axis=-1).astype(jnp.int32)
            random_acts = jax.random.randint(k_unif, (B,), 0, self.venv.action_space.n)
            use_random = jax.random.uniform(k_eps, (B,)) < eps
            acts = jnp.where(use_random, random_acts, greedy)
            env_state, out = self.venv.step(env_state, acts)
            tr = TransitionBatch(
                obs=obs,
                acts=acts,
                next_obs=out.terminal_obs,
                # TD target must not bootstrap through TRUE terminals only.
                dones=out.terminated.astype(jnp.float32),
                rews=out.reward,
            )
            info = {
                "ep_return": out.episode_return,
                "ep_length": out.episode_length,
                "done": out.done,
            }
            return env_state, (tr, info)

        keys = jax.random.split(k_roll, cfg.train_freq)
        env_state, (trs, infos) = jax.lax.scan(step_fn, state.env_state, keys)
        flat = lambda x: x.reshape((cfg.train_freq * B,) + x.shape[2:])
        transitions = jax.tree.map(flat, trs)
        return self._process(
            state, env_state, transitions, infos["done"], infos["ep_return"],
            key,
        )

    def train_step_host(self, state: DQNState):
        """Host-env path: ``train_freq`` epsilon-greedy steps through the
        host collector, then the identical jitted store+TD-update program."""
        assert self._host_collector is not None, "call init_state() first"
        eps = self.epsilon(state.timesteps)
        self._host_collector.params = (state.variables, jnp.asarray(eps))
        chunk = self._host_collector.collect(self.config.train_freq)
        return self._host_process(state, chunk)

    def train_step_host_overlapped(self, state: "DQNState"):
        """Pipelined host-env path (``DQNConfig.overlap_collection``): join
        the chunk collected during the previous round's device update, kick
        off the next collection with the current (pre-update) Q-net and
        epsilon, then dispatch this round's jitted store+TD-update program."""
        assert self._host_collector is not None, "call init_state() first"
        if self._collect_pool is None:
            import concurrent.futures

            self._collect_pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="dqn-host-collect"
            )
        if self._pending_chunk is None:
            eps = self.epsilon(state.timesteps)
            self._host_collector.params = (state.variables, jnp.asarray(eps))
            chunk = self._host_collector.collect(self.config.train_freq)
        else:
            chunk = self._pending_chunk.result()
        eps = self.epsilon(state.timesteps)
        self._host_collector.params = (state.variables, jnp.asarray(eps))
        # Refresh the host param cache synchronously before dispatching the
        # update (the update may donate/invalidate the old device buffers).
        self._host_collector._params_for_apply()
        self._pending_chunk = self._collect_pool.submit(
            self._host_collector.collect, self.config.train_freq
        )
        return self._host_process(state, chunk)

    def discard_pending_collection(self) -> None:
        """Joins and drops any in-flight background collection."""
        if self._pending_chunk is not None:
            try:
                self._pending_chunk.result()
            finally:
                self._pending_chunk = None

    def _host_process(self, state: "DQNState", chunk):
        key, k_proc = jax.random.split(state.key)
        state = state.replace(key=key)
        T, B = chunk.acts.shape[0], chunk.acts.shape[1]
        flat = lambda x: x.reshape((T * B,) + x.shape[2:])
        transitions = TransitionBatch(
            obs=jax.tree.map(flat, chunk.obs),
            acts=flat(chunk.acts).astype(jnp.int32),
            next_obs=jax.tree.map(flat, chunk.next_obs),
            # TD bootstrap cut on true termination only (not time limits)
            dones=flat(chunk.terminated.astype(jnp.float32)),
            rews=flat(chunk.rews),
        )
        done = jnp.asarray(chunk.terminated | chunk.truncated)
        return self._process_jit(
            state, None, transitions, done, jnp.asarray(chunk.episode_return),
            k_proc,
        )

    def _process(
        self,
        state: DQNState,
        env_state,
        transitions: TransitionBatch,
        done,
        ep_return,
        key: jax.Array,
    ):
        cfg = self.config
        eps = self.epsilon(state.timesteps)
        buffer_state = self.replay.store(state.buffer_state, transitions)
        new_timesteps = state.timesteps + transitions.rews.shape[0]

        # 2. Gradient steps (skipped before learning_starts via masking).
        can_learn = buffer_state.size >= jnp.minimum(
            cfg.learning_starts, self.replay.capacity
        )

        def td_update(carry, k_sample):
            params, opt_state, target_params = carry
            if self.sample_hook is not None:
                batch = self.sample_hook(
                    self.replay, buffer_state, k_sample, cfg.batch_size
                )
            else:
                batch = self.replay.sample(buffer_state, k_sample, cfg.batch_size)

            def loss_fn(p):
                q = self.q_net.apply({"params": p}, batch.obs)
                q_sel = jnp.take_along_axis(
                    q, batch.acts[:, None].astype(jnp.int32), axis=1
                )[:, 0]
                q_next = self.q_net.apply({"params": target_params}, batch.next_obs)
                target = batch.rews + cfg.gamma * (1.0 - batch.dones) * q_next.max(
                    axis=-1
                )
                target = jax.lax.stop_gradient(target)
                # Huber loss (SB3 uses smooth_l1)
                err = q_sel - target
                loss = jnp.where(
                    jnp.abs(err) < 1.0, 0.5 * err**2, jnp.abs(err) - 0.5
                ).mean()
                return loss, (q_sel.mean(), target.mean())

            (loss, (q_mean, tgt_mean)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            # mask update before learning starts
            grads = jax.tree.map(
                lambda g: jnp.where(can_learn, g, jnp.zeros_like(g)), grads
            )
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, target_params), {
                "loss": loss,
                "q_mean": q_mean,
                "target_mean": tgt_mean,
            }

        sample_keys = jax.random.split(key, cfg.gradient_steps + 1)
        key = sample_keys[0]
        (params, opt_state, _), aux = jax.lax.scan(
            td_update,
            (state.variables["params"], state.opt_state, state.target_params),
            sample_keys[1:],
        )

        # 3. Target update: hard copy every target_update_interval steps.
        crossed = (
            new_timesteps // cfg.target_update_interval
            > state.timesteps // cfg.target_update_interval
        )
        target_params = jax.tree.map(
            lambda t, p: jnp.where(
                crossed, cfg.tau * p + (1 - cfg.tau) * t, t
            ),
            state.target_params,
            params,
        )

        done_f = done.astype(jnp.float32)
        n_done = done_f.sum()
        metrics = {
            "loss": aux["loss"].mean(),
            "q_mean": aux["q_mean"].mean(),
            "epsilon": eps,
            "buffer_size": buffer_state.size,
            "ep_return_mean": jnp.where(
                n_done > 0,
                (ep_return * done_f).sum() / jnp.maximum(n_done, 1),
                jnp.nan,
            ),
            "n_episodes": n_done,
        }
        new_state = DQNState(
            variables={"params": params},
            target_params=target_params,
            opt_state=opt_state,
            env_state=env_state,
            buffer_state=buffer_state,
            key=key,
            timesteps=new_timesteps,
            n_updates=state.n_updates + cfg.gradient_steps,
        )
        return new_state, metrics

    def learn(
        self,
        state: DQNState,
        total_timesteps: int,
        callback: Optional[Callable] = None,
        log_every: int = 50,
        logger=None,
    ) -> DQNState:
        steps_per_iter = self.config.train_freq * self.venv.num_envs
        n_iters = max(1, int(np.ceil(total_timesteps / steps_per_iter)))
        for i in range(n_iters):
            state, metrics = self._train_step_jit(state)
            if logger is not None and (i + 1) % log_every == 0:
                host = {k: float(v) for k, v in jax.device_get(metrics).items()}
                for k, v in host.items():
                    logger.record(f"dqn/{k}", v)
                logger.dump(step=int(state.timesteps))
            if callback is not None:
                callback(state, metrics)
        # Join any overlapped background collection before returning (a live
        # collect thread stepping the venv would race a subsequent eval).
        self.discard_pending_collection()
        return state

"""SAC: Soft Actor-Critic with automatic temperature tuning.

Replaces SB3's SAC as used by the reference (``rl`` ingredient named config,
scripts/ingredients/rl.py:104-120; ``SAC1024Policy`` policies/base.py:107-121
for PEBBLE-style RLHF).

TPU-native structure mirrors rl/dqn.py: one jitted ``train_step`` doing
collect -> replay store -> K update steps (twin-Q TD, squashed-Gaussian actor,
temperature) -> Polyak target update.

Reward relabeling for off-policy learners — the reference's
``ReplayBufferRewardWrapper`` (policies/replay_buffer_wrapper.py:26-103),
which relabels rewards through the current learned reward at ``sample()``
time so stale replay stays consistent — is the ``relabel_fn`` hook applied to
every sampled batch inside the jitted update, with ``reward_params`` passed
per step.
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
from imitation_tpu.models.distributions import SquashedGaussian
from imitation_tpu.rl import common

LOG_STD_MIN, LOG_STD_MAX = -20.0, 2.0


class SACActor(nn.Module):
    act_dim: int
    hid_sizes: Tuple[int, ...] = (256, 256)

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> SquashedGaussian:
        x = obs.reshape((obs.shape[0], -1)).astype(jnp.float32)
        for i, h in enumerate(self.hid_sizes):
            x = nn.relu(nn.Dense(h, name=f"dense{i}")(x))
        mean = nn.Dense(self.act_dim, name="mean")(x)
        log_std = nn.Dense(self.act_dim, name="log_std")(x)
        log_std = jnp.clip(log_std, LOG_STD_MIN, LOG_STD_MAX)
        return SquashedGaussian(mean=mean, log_std=log_std)


class SACCritic(nn.Module):
    """Twin Q networks evaluated in one module (leading axis 2)."""

    hid_sizes: Tuple[int, ...] = (256, 256)

    @nn.compact
    def __call__(self, obs: jnp.ndarray, acts: jnp.ndarray) -> jnp.ndarray:
        x0 = jnp.concatenate(
            [obs.reshape((obs.shape[0], -1)), acts.reshape((acts.shape[0], -1))],
            axis=-1,
        ).astype(jnp.float32)
        qs = []
        for q in range(2):
            x = x0
            for i, h in enumerate(self.hid_sizes):
                x = nn.relu(nn.Dense(h, name=f"q{q}_dense{i}")(x))
            qs.append(nn.Dense(1, name=f"q{q}_out")(x)[:, 0])
        return jnp.stack(qs)  # [2, B]


@dataclasses.dataclass
class SACConfig:
    learning_rate: float = 3e-4
    buffer_size: int = 1_000_000
    learning_starts: int = 100
    batch_size: int = 256
    tau: float = 0.005
    gamma: float = 0.99
    train_freq: int = 1
    gradient_steps: int = 1
    ent_coef: str = "auto"  # "auto" or a float string
    target_entropy: Optional[float] = None  # default -act_dim
    actor_hid_sizes: Tuple[int, ...] = (256, 256)
    critic_hid_sizes: Tuple[int, ...] = (256, 256)
    # Host (MuJoCo/gym-bridge) envs only: collect the next train_freq steps
    # in a background thread while the chip runs this round's gradient
    # updates (one-round-stale behaviour policy — SAC is off-policy, so the
    # replay math is unchanged; only the sampling distribution lags one
    # update). See PPOConfig.overlap_collection for the same trade.
    overlap_collection: bool = False


@struct.dataclass
class SACState:
    actor_params: Any
    critic_params: Any
    target_critic_params: Any
    log_alpha: jnp.ndarray
    actor_opt: Any
    critic_opt: Any
    alpha_opt: Any
    env_state: VecEnvState
    buffer_state: BufferState
    key: jax.Array
    timesteps: jnp.ndarray
    n_updates: jnp.ndarray

    @property
    def variables(self):
        """Policy variables alias so generic code (rollout eval, serialization
        callbacks) can treat SACState like RLState."""
        return {"params": self.actor_params}


# relabel hook: (reward_params, batch) -> batch with replaced rews
RelabelBatchFn = Callable[[Any, TransitionBatch], TransitionBatch]

# sample hook: (replay, buffer_state, key, batch_size) -> TransitionBatch
# (same contract as rl/dqn.py — SQIL's 50/50 expert mixing plugs in here)
SampleHook = Callable[[Any, Any, jax.Array, int], TransitionBatch]


class SACPolicy:
    """Standalone SAC actor policy: sample/deterministic/log-prob fns over
    env-scaled actions. Serializable via ``policies.serialize.save_policy``
    (the reference saves SB3 SAC model.zip, policies/serialize.py:155-180)."""

    def __init__(self, observation_space, action_space, hid_sizes=(256, 256)):
        self.observation_space = observation_space
        self.action_space = action_space
        self.hid_sizes = tuple(hid_sizes)
        self.actor = SACActor(action_space.flat_dim, self.hid_sizes)
        low = np.broadcast_to(np.asarray(action_space.low, np.float32), action_space.shape)
        high = np.broadcast_to(np.asarray(action_space.high, np.float32), action_space.shape)
        self._act_scale = jnp.asarray((high - low) / 2.0)
        self._act_center = jnp.asarray((high + low) / 2.0)

    def _scale(self, squashed):
        return (
            squashed.reshape((-1,) + self.action_space.shape) * self._act_scale
            + self._act_center
        )

    def sample_fn(self):
        def f(variables, obs, key):
            dist = self.actor.apply(variables, obs)
            squashed, lp = dist.sample_and_log_prob(key)
            return self._scale(squashed), {"log_prob": lp}

        return f

    def deterministic_fn(self):
        def f(variables, obs, key):
            dist = self.actor.apply(variables, obs)
            return self._scale(dist.mode()), {}

        return f

    def init_variables(self, key: jax.Array):
        obs = jnp.zeros((1,) + self.observation_space.shape, jnp.float32)
        return {"params": self.actor.init(key, obs)["params"]}


class SAC:
    """Soft Actor-Critic over a VectorEnv (continuous actions).

    Actions are internally squashed to (-1, 1) and rescaled to the env's
    action bounds at step time.
    """

    def __init__(
        self,
        venv: VectorEnv,
        config: SACConfig = SACConfig(),
        *,
        relabel_fn: Optional[RelabelBatchFn] = None,
        sample_hook: Optional[SampleHook] = None,
        seed: int = 0,
    ):
        if venv.action_space.is_discrete:
            raise ValueError("SAC requires a continuous action space")
        # Host (MuJoCo/gym-bridge) envs take the PPO-style split: env
        # stepping through a HostCollector, everything after the collect —
        # replay store + all gradient updates — in one jitted program per
        # round (train_freq host steps, then gradient_steps scanned
        # updates). Device envs keep the fully-fused collect+update scan.
        # Adversarial train_fused reads is_host_env for its own guard.
        self.is_host_env = bool(getattr(venv, "is_host", False))
        self._host_collector = None
        self._pending_chunk = None
        self._collect_pool = None
        self.venv = venv
        self.config = config
        self.act_dim = venv.action_space.flat_dim
        space = venv.action_space
        low = np.broadcast_to(np.asarray(space.low, np.float32), space.shape)
        high = np.broadcast_to(np.asarray(space.high, np.float32), space.shape)
        self._act_scale = jnp.asarray((high - low) / 2.0)
        self._act_center = jnp.asarray((high + low) / 2.0)
        self.actor = SACActor(self.act_dim, tuple(config.actor_hid_sizes))
        self.critic = SACCritic(tuple(config.critic_hid_sizes))
        self.actor_optimizer = optax.adam(config.learning_rate)
        self.critic_optimizer = optax.adam(config.learning_rate)
        self.alpha_optimizer = optax.adam(config.learning_rate)
        self.replay = ReplayBuffer(config.buffer_size)
        self.relabel_fn = relabel_fn
        self.sample_hook = sample_hook
        # When True, train_step also returns the freshly collected
        # TransitionBatch (adversarial trainers store it for disc batches,
        # the reference's BufferingWrapper pop, common.py:422-425).
        self.return_transitions = False
        self._seed = seed
        self.target_entropy = (
            config.target_entropy
            if config.target_entropy is not None
            else -float(self.act_dim)
        )
        self._auto_alpha = config.ent_coef == "auto"
        self._fixed_alpha = None if self._auto_alpha else float(config.ent_coef)
        self.rebind()

    def _scale(self, squashed: jnp.ndarray) -> jnp.ndarray:
        return (
            squashed.reshape((-1,) + self.venv.action_space.shape) * self._act_scale
            + self._act_center
        )

    def init_state(self, key: Optional[jax.Array] = None) -> SACState:
        key = key if key is not None else jax.random.key(self._seed)
        ka, kc, kenv, key = jax.random.split(key, 4)
        obs = jnp.zeros((1,) + self.venv.observation_space.shape, jnp.float32)
        acts = jnp.zeros((1, self.act_dim), jnp.float32)
        actor_params = self.actor.init(ka, obs)["params"]
        critic_params = self.critic.init(kc, obs, acts)["params"]
        example = TransitionBatch(
            obs=obs,
            acts=jnp.zeros((1,) + self.venv.action_space.shape, jnp.float32),
            next_obs=obs,
            dones=jnp.zeros((1,)),
            rews=jnp.zeros((1,)),
        )
        if self.is_host_env:
            from imitation_tpu.data import rollout as rollout_mod

            env_state = None
            self._host_collector = rollout_mod.HostCollector(
                self.venv, self.sample_fn(), {"params": actor_params},
                seed=self._seed,
            )
        else:
            env_state = self.venv.reset(kenv)
        return SACState(
            actor_params=actor_params,
            critic_params=critic_params,
            target_critic_params=critic_params,
            log_alpha=jnp.zeros(()),
            actor_opt=self.actor_optimizer.init(actor_params),
            critic_opt=self.critic_optimizer.init(critic_params),
            alpha_opt=self.alpha_optimizer.init(jnp.zeros(())),
            env_state=env_state,
            buffer_state=self.replay.init_state(example),
            key=key,
            timesteps=jnp.zeros((), jnp.int32),
            n_updates=jnp.zeros((), jnp.int32),
        )

    def sample_fn(self):
        """Stochastic rollout policy (env-scaled actions)."""

        def f(variables, obs, key):
            dist = self.actor.apply(variables, obs)
            squashed, lp = dist.sample_and_log_prob(key)
            return self._scale(squashed), {"log_prob": lp}

        return f

    def deterministic_fn(self):
        def f(variables, obs, key):
            dist = self.actor.apply(variables, obs)
            return self._scale(dist.mode()), {}

        return f

    def train_step(
        self, state: SACState, reward_params: Any = None
    ) -> Tuple[SACState, Dict[str, jnp.ndarray]]:
        cfg = self.config
        B = self.venv.num_envs
        key, k_roll = jax.random.split(state.key)

        # 1. Collect.
        def step_fn(carry, step_key):
            env_state = carry
            obs = env_state.obs
            dist = self.actor.apply({"params": state.actor_params}, obs)
            squashed, _ = dist.sample_and_log_prob(step_key)
            acts_env = self._scale(squashed)
            env_state, out = self.venv.step(env_state, acts_env)
            tr = TransitionBatch(
                obs=obs,
                acts=acts_env,
                next_obs=out.terminal_obs,
                dones=out.terminated.astype(jnp.float32),
                rews=out.reward,
            )
            info = {"ep_return": out.episode_return, "done": out.done}
            return env_state, (tr, info)

        keys = jax.random.split(k_roll, cfg.train_freq)
        env_state, (trs, infos) = jax.lax.scan(step_fn, state.env_state, keys)
        flat = lambda x: x.reshape((cfg.train_freq * B,) + x.shape[2:])
        transitions = jax.tree.map(flat, trs)
        return self._process(
            state, env_state, transitions, infos["done"], infos["ep_return"],
            key, reward_params,
        )

    def train_step_host(self, state: SACState, reward_params: Any = None):
        """Host-env path: ``train_freq`` env steps through the host
        collector, then the identical jitted store+update program. The
        off-policy round semantics match SB3's ``train_freq``/
        ``gradient_steps`` (reference rl ingredient, ingredients/rl.py:104-120)."""
        assert self._host_collector is not None, "call init_state() first"
        self._host_collector.params = {"params": state.actor_params}
        chunk = self._host_collector.collect(self.config.train_freq)
        return self._host_process(state, chunk, reward_params)

    def train_step_host_overlapped(self, state: SACState, reward_params: Any = None):
        """Pipelined host-env path (``SACConfig.overlap_collection``): join
        the chunk collected during the previous round's device update, kick
        off the next collection with the current (pre-update) actor, then
        dispatch this round's jitted store+update program."""
        assert self._host_collector is not None, "call init_state() first"
        if self._collect_pool is None:
            import concurrent.futures

            self._collect_pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="sac-host-collect"
            )
        if self._pending_chunk is None:
            self._host_collector.params = {"params": state.actor_params}
            chunk = self._host_collector.collect(self.config.train_freq)
        else:
            chunk = self._pending_chunk.result()
        # Refresh the host param cache synchronously before dispatching the
        # update (the update may donate/invalidate the old device buffers).
        self._host_collector.params = {"params": state.actor_params}
        self._host_collector._params_for_apply()
        self._pending_chunk = self._collect_pool.submit(
            self._host_collector.collect, self.config.train_freq
        )
        return self._host_process(state, chunk, reward_params)

    def discard_pending_collection(self) -> None:
        """Joins and drops any in-flight background collection (call after
        externally swapping actor params, e.g. a warm start)."""
        if self._pending_chunk is not None:
            try:
                self._pending_chunk.result()
            finally:
                self._pending_chunk = None

    def _host_process(self, state: SACState, chunk, reward_params: Any = None):
        key, k_proc = jax.random.split(state.key)
        state = state.replace(key=key)
        T, B = chunk.acts.shape[0], chunk.acts.shape[1]
        flat = lambda x: x.reshape((T * B,) + x.shape[2:])
        transitions = TransitionBatch(
            obs=jax.tree.map(flat, chunk.obs),
            acts=flat(chunk.acts),
            next_obs=jax.tree.map(flat, chunk.next_obs),
            # bootstrap cut on true termination only — truncation (time
            # limit) must still bootstrap, like the device step_fn above
            dones=flat(chunk.terminated.astype(jnp.float32)),
            rews=flat(chunk.rews),
        )
        done = jnp.asarray(chunk.terminated | chunk.truncated)
        return self._process_jit(
            state, None, transitions, done, jnp.asarray(chunk.episode_return),
            k_proc, reward_params,
        )

    def _process(
        self,
        state: SACState,
        env_state,
        transitions: TransitionBatch,
        done,
        ep_return,
        key: jax.Array,
        reward_params: Any = None,
    ):
        cfg = self.config
        buffer_state = self.replay.store(state.buffer_state, transitions)
        new_timesteps = state.timesteps + transitions.rews.shape[0]
        can_learn = buffer_state.size >= jnp.minimum(
            cfg.learning_starts, self.replay.capacity
        )

        def to_squashed(acts_env):
            a = (acts_env.reshape(acts_env.shape[0], -1) - self._act_center.reshape(-1)) / (
                self._act_scale.reshape(-1)
            )
            return jnp.clip(a, -1 + 1e-6, 1 - 1e-6)

        def update(carry, k):
            (actor_params, critic_params, target_params, log_alpha,
             actor_opt, critic_opt, alpha_opt) = carry
            k_sample, k_next, k_pi = jax.random.split(k, 3)
            if self.sample_hook is not None:
                batch = self.sample_hook(
                    self.replay, buffer_state, k_sample, cfg.batch_size
                )
            else:
                batch = self.replay.sample(buffer_state, k_sample, cfg.batch_size)
            if self.relabel_fn is not None:
                batch = self.relabel_fn(reward_params, batch)
            alpha = (
                jnp.exp(log_alpha) if self._auto_alpha else jnp.asarray(self._fixed_alpha)
            )

            # -- critic update --
            next_dist = self.actor.apply({"params": actor_params}, batch.next_obs)
            next_sq, next_lp = next_dist.sample_and_log_prob(k_next)
            next_env = self._scale(next_sq)
            q_next = self.critic.apply(
                {"params": target_params}, batch.next_obs, next_env
            ).min(axis=0)
            target = batch.rews + cfg.gamma * (1.0 - batch.dones) * (
                q_next - alpha * next_lp
            )
            target = jax.lax.stop_gradient(target)

            def critic_loss_fn(cp):
                qs = self.critic.apply({"params": cp}, batch.obs, batch.acts)
                return ((qs - target[None]) ** 2).mean(), qs.mean()

            (c_loss, q_mean), c_grads = jax.value_and_grad(
                critic_loss_fn, has_aux=True
            )(critic_params)

            # -- actor update --
            def actor_loss_fn(ap):
                dist = self.actor.apply({"params": ap}, batch.obs)
                sq, lp = dist.sample_and_log_prob(k_pi)
                acts_env = self._scale(sq)
                q = self.critic.apply(
                    {"params": critic_params}, batch.obs, acts_env
                ).min(axis=0)
                return (alpha * lp - q).mean(), lp.mean()

            (a_loss, lp_mean), a_grads = jax.value_and_grad(
                actor_loss_fn, has_aux=True
            )(actor_params)

            # -- temperature update --
            def alpha_loss_fn(la):
                return -(jnp.exp(la) * jax.lax.stop_gradient(
                    lp_mean + self.target_entropy
                ))

            al_loss, al_grad = jax.value_and_grad(alpha_loss_fn)(log_alpha)

            mask = lambda g: jax.tree.map(
                lambda x: jnp.where(can_learn, x, jnp.zeros_like(x)), g
            )
            c_up, critic_opt = self.critic_optimizer.update(
                mask(c_grads), critic_opt, critic_params
            )
            critic_params = optax.apply_updates(critic_params, c_up)
            a_up, actor_opt = self.actor_optimizer.update(
                mask(a_grads), actor_opt, actor_params
            )
            actor_params = optax.apply_updates(actor_params, a_up)
            if self._auto_alpha:
                al_up, alpha_opt = self.alpha_optimizer.update(
                    mask(al_grad), alpha_opt, log_alpha
                )
                log_alpha = optax.apply_updates(log_alpha, al_up)
            target_params = jax.tree.map(
                lambda t, p: jnp.where(can_learn, (1 - cfg.tau) * t + cfg.tau * p, t),
                target_params,
                critic_params,
            )
            carry = (actor_params, critic_params, target_params, log_alpha,
                     actor_opt, critic_opt, alpha_opt)
            return carry, {
                "critic_loss": c_loss,
                "actor_loss": a_loss,
                "alpha": alpha,
                "q_mean": q_mean,
                "entropy": -lp_mean,
            }

        carry0 = (
            state.actor_params, state.critic_params, state.target_critic_params,
            state.log_alpha, state.actor_opt, state.critic_opt, state.alpha_opt,
        )
        update_keys = jax.random.split(key, cfg.gradient_steps + 1)
        key = update_keys[0]
        carry, aux = jax.lax.scan(update, carry0, update_keys[1:])
        (actor_params, critic_params, target_params, log_alpha,
         actor_opt, critic_opt, alpha_opt) = carry

        done_f = done.astype(jnp.float32)
        n_done = done_f.sum()
        metrics = {k: v.mean() for k, v in aux.items()}
        metrics["ep_return_mean"] = jnp.where(
            n_done > 0,
            (ep_return * done_f).sum() / jnp.maximum(n_done, 1),
            jnp.nan,
        )
        metrics["buffer_size"] = buffer_state.size

        new_state = SACState(
            actor_params=actor_params,
            critic_params=critic_params,
            target_critic_params=target_params,
            log_alpha=log_alpha,
            actor_opt=actor_opt,
            critic_opt=critic_opt,
            alpha_opt=alpha_opt,
            env_state=env_state,
            buffer_state=buffer_state,
            key=key,
            timesteps=new_timesteps,
            n_updates=state.n_updates + cfg.gradient_steps,
        )
        if self.return_transitions:
            return new_state, metrics, transitions
        return new_state, metrics

    def rebind(self) -> None:
        """Re-jit after hooks (relabel_fn/return_transitions) change."""
        if self.is_host_env:
            self._process_jit = jax.jit(self._process)
            self._train_step_jit = (
                self.train_step_host_overlapped
                if self.config.overlap_collection
                else self.train_step_host
            )
        else:
            self._train_step_jit = jax.jit(self.train_step)

    def log_prob_fn(self):
        """log pi(a|s) of env-scaled actions, incl. the affine-rescale
        jacobian — AIRL's disc logit term for off-policy generators
        (reference _get_log_policy_act_prob, adversarial/common.py:476-519)."""
        log_scale_sum = float(np.sum(np.log(np.asarray(self._act_scale))))

        def f(variables, obs, acts_env):
            dist = self.actor.apply(variables, obs)
            a = (acts_env.reshape(acts_env.shape[0], -1)
                 - self._act_center.reshape(-1)) / self._act_scale.reshape(-1)
            a = jnp.clip(a, -1 + 1e-6, 1 - 1e-6)
            return dist.log_prob(a) - log_scale_sum

        return f

    def learn(
        self,
        state: SACState,
        total_timesteps: int,
        reward_params: Any = None,
        callback: Optional[Callable] = None,
        logger=None,
        log_every: int = 100,
    ) -> SACState:
        steps_per_iter = self.config.train_freq * self.venv.num_envs
        n_iters = max(1, int(np.ceil(total_timesteps / steps_per_iter)))
        for i in range(n_iters):
            state, metrics = self._train_step_jit(state, reward_params)
            if logger is not None and (i + 1) % log_every == 0:
                host = {k: float(v) for k, v in jax.device_get(metrics).items()}
                for k, v in host.items():
                    logger.record(f"sac/{k}", v)
                logger.dump(step=int(state.timesteps))
            if callback is not None:
                callback(state, metrics)
        # Join any overlapped background collection before returning (a live
        # collect thread stepping the venv would race a subsequent eval).
        self.discard_pending_collection()
        return state

    @property
    def policy(self) -> SACPolicy:
        p = SACPolicy(
            self.venv.observation_space,
            self.venv.action_space,
            tuple(self.config.actor_hid_sizes),
        )
        # share this SAC's actor module so apply() sees identical structure
        p.actor = self.actor
        return p

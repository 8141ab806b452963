"""PPO: clipped-surrogate on-policy learner, one jitted program per iteration.

Replaces SB3's PPO as the reference's default generator algorithm
(reference: src/imitation/scripts/ingredients/rl.py:34-66 — PPO defaults
n_steps=2048, batch_size=64, 10 epochs, clip 0.2, GAE lambda 0.95).

TPU-native structure: ``train_step`` fuses, in a single XLA program,
  1. rollout of ``n_steps`` lockstep env steps (lax.scan over the VectorEnv),
  2. optional learned-reward relabeling over the whole [T, B] chunk (the
     reference's per-step RewardVecEnvWrapper callback, reward_wrapper.py:92-133,
     becomes one batched reward-net forward),
  3. GAE via parallel associative scan (ops/gae.py),
  4. n_epochs x n_minibatches clipped PPO updates (lax.scan over shuffled
     minibatches).
The host loop around it only accumulates metrics.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from imitation_tpu.data import rollout as rollout_mod
from imitation_tpu.envs.vector import VectorEnv
from imitation_tpu.models.policies import ActorCriticPolicy
from imitation_tpu.ops.gae import gae
from imitation_tpu.rl import common


@dataclasses.dataclass
class PPOConfig:
    n_steps: int = 2048  # rollout length per env per iteration
    learning_rate: float = 3e-4
    lr_schedule: str = "constant"  # "constant" | "linear" (decay to 0)
    total_updates_hint: int = 1000  # schedule horizon in train_step calls
    n_epochs: int = 10
    n_minibatches: int = 32  # SB3 batch_size=64 at n_steps*n_envs=2048
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_range: float = 0.2
    clip_range_vf: Optional[float] = None
    ent_coef: float = 0.0
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    normalize_advantage: bool = True
    normalize_rewards: bool = False  # VecNormalize(norm_reward) equivalent
    reward_clip: float = 10.0
    # SB3 semantics: once a minibatch's approx_kl exceeds 1.5*target_kl, no
    # further updates are applied this iteration (the loop stays static
    # under jit; late minibatches become masked no-ops).
    target_kl: Optional[float] = None
    # Host (gym-bridge/MuJoCo) envs only: pipeline host env stepping with
    # the device update — the chunk for iteration k+1 is collected in a
    # background thread while the chip runs the PPO (and, in adversarial
    # trainers, discriminator) updates for iteration k. The next chunk is
    # collected with the pre-update policy (one-update staleness, the
    # standard async actor-learner trade); PPO's importance ratios use the
    # behaviour log-probs stored in the chunk, so the update math remains
    # well-defined for slightly-off-policy data. Default off: the
    # serialized path keeps SB3's exact on-policy semantics.
    overlap_collection: bool = False


class PPO:
    """On-policy PPO over a VectorEnv.

    ``train_step(state, reward_params)`` is pure and jitted once; pass
    ``reward_fn`` at construction to relabel rewards with a learned reward
    (GAIL/AIRL/preference-RLHF generator training).
    """

    def __init__(
        self,
        venv: VectorEnv,
        policy: ActorCriticPolicy,
        config: PPOConfig = PPOConfig(),
        *,
        reward_fn: Optional[common.RelabelRewardFn] = None,
        return_transitions: bool = False,
        seed: int = 0,
    ):
        self.venv = venv
        self.policy = policy
        self.config = config
        self.reward_fn = reward_fn
        self.return_transitions = return_transitions
        if config.lr_schedule == "linear":
            import optax as _optax

            updates_per_call = config.n_epochs * config.n_minibatches
            lr = _optax.linear_schedule(
                config.learning_rate,
                0.0,
                config.total_updates_hint * updates_per_call,
            )
        elif config.lr_schedule == "constant":
            lr = config.learning_rate
        else:
            raise ValueError(f"unknown lr_schedule {config.lr_schedule!r}")
        self.optimizer = common.make_optimizer(lr, config.max_grad_norm)
        self._seed = seed
        batch = config.n_steps * venv.num_envs
        if batch % config.n_minibatches != 0:
            raise ValueError(
                f"n_steps*n_envs={batch} not divisible by "
                f"n_minibatches={config.n_minibatches}"
            )
        self.is_host_env = bool(getattr(venv, "is_host", False))
        self._host_collector = None
        self._pending_chunk = None
        self._collect_pool = None
        # Optional util.profiling.PhaseTimer: when set, the host-env paths
        # record per-phase wall time (host_collect / device_update /
        # collect_join). The serialized path adds a device fetch barrier
        # per iteration for honest attribution — profiling mode only.
        self.phase_timer = None
        self.rebind()

    def rebind(self) -> None:
        """(Re)builds the jitted entry points. Call after mutating
        ``reward_fn`` / ``return_transitions`` (the adversarial and RLHF
        trainers inject these post-construction)."""
        if self.is_host_env:
            # Host (gym-bridge) envs: env stepping on host, everything after
            # the collect — relabel, GAE, all PPO updates — in one jitted
            # program over the chunk.
            self._process_chunk_jit = jax.jit(self.process_chunk)
            self._train_step_jit = (
                self.train_step_host_overlapped
                if self.config.overlap_collection
                else self.train_step_host
            )
        else:
            self._train_step_jit = jax.jit(self.train_step)

    # -- state -------------------------------------------------------------
    def init_state(self, key: Optional[jax.Array] = None) -> common.RLState:
        key = key if key is not None else jax.random.key(self._seed)
        k_init, k_env, key = jax.random.split(key, 3)
        variables = self.policy.init(k_init)
        params = variables["params"]
        opt_state = self.optimizer.init(params)
        if self.is_host_env:
            env_state = None
            self._host_collector = rollout_mod.HostCollector(
                self.venv, self.policy.sample_fn(), variables, seed=self._seed
            )
        else:
            env_state = self.venv.reset(k_env)
        reward_norm = None
        if self.config.normalize_rewards:
            reward_norm = common.RewNormState(
                ret=jnp.zeros((self.venv.num_envs,)),
                var=jnp.ones(()),
                mean=jnp.zeros(()),
                count=jnp.zeros(()),
            )
        return common.RLState(
            variables=variables,
            opt_state=opt_state,
            env_state=env_state,
            key=key,
            timesteps=jnp.zeros((), jnp.int32),
            n_updates=jnp.zeros((), jnp.int32),
            reward_norm=reward_norm,
        )

    # -- pure train step ---------------------------------------------------
    def train_step(
        self, state: common.RLState, reward_params: Any = None
    ):
        """Device path: rollout + update fused into one program."""
        key, k_roll, k_proc = jax.random.split(state.key, 3)
        env_state, chunk = rollout_mod.collect(
            self.venv,
            self.policy.sample_fn(),
            state.variables,
            state.env_state,
            self.config.n_steps,
            k_roll,
        )
        return self.process_chunk(state, env_state, chunk, k_proc, reward_params)

    def train_step_host(self, state: common.RLState, reward_params: Any = None):
        """Host-env path: collect on host, jitted processing on device."""
        assert self._host_collector is not None, "call init_state() first"
        timer = self.phase_timer
        if timer is None:
            self._host_collector.params = state.variables
            chunk = self._host_collector.collect(self.config.n_steps)
            key, k_proc = jax.random.split(state.key)
            state = state.replace(key=key)
            return self._process_chunk_jit(state, None, chunk, k_proc, reward_params)
        with timer.phase("host_collect"):
            self._host_collector.params = state.variables
            chunk = self._host_collector.collect(self.config.n_steps)
        key, k_proc = jax.random.split(state.key)
        state = state.replace(key=key)
        with timer.phase("device_update"):
            out = self._process_chunk_jit(state, None, chunk, k_proc, reward_params)
            # Fetch barrier so the span covers execution, not dispatch.
            jax.device_get(out[0].variables["params"])
        return out

    def train_step_host_overlapped(
        self, state: common.RLState, reward_params: Any = None
    ):
        """Pipelined host-env path (``PPOConfig.overlap_collection``).

        Joins the chunk collected in the background during the previous
        iteration's device update, immediately kicks off collection of the
        NEXT chunk with the current (pre-update) policy, then dispatches
        this iteration's jitted update. Host MuJoCo stepping and the chip's
        PPO/discriminator work stack instead of serializing — on the
        2-vCPU/1-chip bench host this is where the GAIL HalfCheetah
        end-to-end throughput ceiling moves (VERDICT r3 item 4).
        """
        assert self._host_collector is not None, "call init_state() first"
        if self._collect_pool is None:
            import concurrent.futures

            self._collect_pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="ppo-host-collect"
            )
        timer = self.phase_timer
        if self._pending_chunk is None:
            self._host_collector.params = state.variables
            chunk = self._host_collector.collect(self.config.n_steps)
        elif timer is not None:
            # Time only the host-blocked wait on the background collection —
            # no device barrier here, which would serialize the pipeline
            # this path exists to create.
            with timer.phase("collect_join"):
                chunk = self._pending_chunk.result()
        else:
            chunk = self._pending_chunk.result()
        # Refresh the collector's host-side param cache synchronously BEFORE
        # dispatching the device update: the update may invalidate (donate)
        # the old device buffers, and a device_get racing that invalidation
        # from the collect thread would be undefined.
        self._host_collector.params = state.variables
        self._host_collector._params_for_apply()
        self._pending_chunk = self._collect_pool.submit(
            self._host_collector.collect, self.config.n_steps
        )
        key, k_proc = jax.random.split(state.key)
        state = state.replace(key=key)
        return self._process_chunk_jit(state, None, chunk, k_proc, reward_params)

    def discard_pending_collection(self) -> None:
        """Joins and drops any in-flight background collection (call after
        externally swapping policy params, e.g. a warm start, so the next
        chunk is not one collected under the replaced policy)."""
        if self._pending_chunk is not None:
            try:
                self._pending_chunk.result()
            finally:
                self._pending_chunk = None

    def process_chunk(
        self,
        state: common.RLState,
        env_state: Any,
        chunk: rollout_mod.RolloutChunk,
        key: jax.Array,
        reward_params: Any = None,
    ) -> Tuple[common.RLState, Dict[str, jnp.ndarray]]:
        cfg = self.config
        key, k_perm = jax.random.split(key)
        T, B = chunk.acts.shape[0], chunk.acts.shape[1]

        # 1b. Observation-normalizer update: fold this chunk's observations
        # into the policy's RunningNorm stats once per iteration (the
        # VecNormalize(norm_obs)/NormalizeFeaturesExtractor training-time
        # behavior; rollout used the previous stats, like SB3).
        state_variables = state.variables
        if getattr(self.policy, "normalize_features", False):
            flat_obs0 = jax.tree.map(
                lambda x: x.reshape((T * B,) + x.shape[2:]), chunk.obs
            )
            acts0 = chunk.acts.reshape((T * B,) + chunk.acts.shape[2:])
            out = self.policy.evaluate_actions(
                state_variables, flat_obs0, acts0, update_stats=True
            )
            mutated = out[-1]
            state_variables = {**state_variables, **mutated}
        state = state.replace(variables=state_variables)

        # 2. Optional reward relabeling (fused batched reward-net forward).
        true_rews = chunk.rews
        if self.reward_fn is not None:
            flat = lambda x: x.reshape((T * B,) + x.shape[2:])
            rews = self.reward_fn(
                reward_params,
                jax.tree.map(flat, chunk.obs),
                flat(chunk.acts),
                jax.tree.map(flat, chunk.next_obs),
                flat(chunk.dones.astype(jnp.float32)),
            ).reshape(T, B)
        else:
            rews = true_rews

        # 2b. Optional reward normalization by running std of discounted
        # returns (SB3 VecNormalize semantics: update stats, then scale+clip).
        reward_norm = state.reward_norm
        if cfg.normalize_rewards:
            assert reward_norm is not None

            def rn_step(rn, inputs):
                r_t, done_t = inputs
                ret = rn.ret * cfg.gamma + r_t  # [B]
                b_count = ret.shape[0]
                b_mean = ret.mean()
                b_var = ret.var()
                total = rn.count + b_count
                delta = b_mean - rn.mean
                new_mean = rn.mean + delta * b_count / total
                m2 = rn.var * rn.count + b_var * b_count + delta**2 * rn.count * b_count / total
                new_var = m2 / total
                r_out = jnp.clip(
                    r_t * jax.lax.rsqrt(new_var + 1e-8),
                    -cfg.reward_clip,
                    cfg.reward_clip,
                )
                new_rn = common.RewNormState(
                    ret=ret * (1.0 - done_t.astype(ret.dtype)),
                    var=new_var,
                    mean=new_mean,
                    count=total,
                )
                return new_rn, r_out

            reward_norm, rews = jax.lax.scan(
                rn_step, reward_norm, (rews, chunk.dones)
            )

        # 3. GAE. values for obs come from rollout aux (recomputed in one
        # batched forward for host chunks, which carry no aux); next-values
        # from one batched forward over next_obs (exact truncation bootstrap).
        flat2 = lambda x: x.reshape((T * B,) + x.shape[2:])
        aux = chunk.aux if isinstance(chunk.aux, dict) and "value" in chunk.aux else None
        if aux is None:
            obs_flat = jax.tree.map(flat2, chunk.obs)
            dist, values_flat = self.policy.dist_and_value(state.variables, obs_flat)
            acts_flat = flat2(chunk.acts)
            if self.policy.action_space.is_discrete:
                lp_flat = dist.log_prob(acts_flat.astype(jnp.int32))
            else:
                lp_flat = dist.log_prob(acts_flat.reshape(acts_flat.shape[0], -1))
            values = values_flat.reshape(T, B)
            log_probs = lp_flat.reshape(T, B)
        else:
            values = aux["value"]
            log_probs = aux["log_prob"]
        next_values = self.policy.value(
            state.variables, jax.tree.map(flat2, chunk.next_obs)
        ).reshape(T, B)
        advantages, returns = gae(
            rews,
            values,
            next_values,
            chunk.terminated,
            chunk.dones,
            cfg.gamma,
            cfg.gae_lambda,
        )

        # 4. Epochs of minibatched clipped updates.
        batch = {
            "obs": jax.tree.map(flat2, chunk.obs),
            "acts": flat2(chunk.acts),
            "old_log_prob": flat2(log_probs),
            "old_value": flat2(values),
            "advantages": flat2(advantages),
            "returns": flat2(returns),
        }
        n_mb = cfg.n_minibatches
        mb_size = (T * B) // n_mb

        def loss_fn(params, mb):
            variables = {**state.variables, "params": params}
            lp, ent, value = self.policy.evaluate_actions(
                variables, mb["obs"], mb["acts"]
            )
            adv = mb["advantages"]
            if cfg.normalize_advantage:
                adv = (adv - adv.mean()) / (adv.std() + 1e-8)
            ratio = jnp.exp(lp - mb["old_log_prob"])
            pg1 = adv * ratio
            pg2 = adv * jnp.clip(ratio, 1.0 - cfg.clip_range, 1.0 + cfg.clip_range)
            pg_loss = -jnp.minimum(pg1, pg2).mean()
            if cfg.clip_range_vf is not None:
                v_clipped = mb["old_value"] + jnp.clip(
                    value - mb["old_value"], -cfg.clip_range_vf, cfg.clip_range_vf
                )
                v_loss = jnp.maximum(
                    (value - mb["returns"]) ** 2, (v_clipped - mb["returns"]) ** 2
                ).mean()
            else:
                v_loss = ((value - mb["returns"]) ** 2).mean()
            ent_loss = -ent.mean()
            total = pg_loss + cfg.ent_coef * ent_loss + cfg.vf_coef * v_loss
            clip_frac = (jnp.abs(ratio - 1.0) > cfg.clip_range).mean()
            approx_kl = ((ratio - 1.0) - jnp.log(ratio)).mean()
            aux = {
                "policy_loss": pg_loss,
                "value_loss": v_loss,
                "entropy": ent.mean(),
                "clip_fraction": clip_frac,
                "approx_kl": approx_kl,
            }
            return total, aux

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def epoch_step(carry, ep_key):
            params, opt_state, cont = carry
            perm = jax.random.permutation(ep_key, T * B)
            shuffled = jax.tree.map(
                lambda x: x[perm].reshape((n_mb, mb_size) + x.shape[1:]), batch
            )

            def mb_step(carry, mb):
                params, opt_state, cont = carry
                (loss, aux), grads = grad_fn(params, mb)
                updates, new_opt_state = self.optimizer.update(
                    grads, opt_state, params
                )
                new_params = optax.apply_updates(params, updates)
                if cfg.target_kl is not None:
                    # SB3 ppo.py early stop: the minibatch whose approx_kl
                    # exceeds 1.5*target_kl is NOT applied, nor is anything
                    # after it this train_step (static loop; masked select).
                    exceeded = aux["approx_kl"] > 1.5 * cfg.target_kl
                    use = jnp.logical_and(cont, jnp.logical_not(exceeded))
                    pick = lambda n, o: jax.tree.map(
                        lambda a, b: jnp.where(use, a, b), n, o
                    )
                    params = pick(new_params, params)
                    opt_state = pick(new_opt_state, opt_state)
                    cont = use
                else:
                    params, opt_state = new_params, new_opt_state
                aux["loss"] = loss
                aux["grad_norm"] = common.global_norm(grads)
                return (params, opt_state, cont), aux

            (params, opt_state, cont), auxs = jax.lax.scan(
                mb_step, (params, opt_state, cont), shuffled
            )
            return (params, opt_state, cont), auxs

        ep_keys = jax.random.split(k_perm, cfg.n_epochs)
        params = state.variables["params"]
        cont0 = jnp.asarray(True)
        (params, opt_state, cont), auxs = jax.lax.scan(
            epoch_step, (params, state.opt_state, cont0), ep_keys
        )

        metrics = {k: v.mean() for k, v in auxs.items()}
        if cfg.target_kl is not None:
            metrics["early_stop"] = 1.0 - cont.astype(jnp.float32)
        metrics["explained_variance"] = common.explained_variance(
            batch["old_value"], batch["returns"]
        )
        # Monitor stats over episodes finished inside this chunk.
        done_f = chunk.dones.astype(jnp.float32)
        n_done = done_f.sum()
        metrics["ep_return_mean"] = jnp.where(
            n_done > 0, (chunk.episode_return * done_f).sum() / jnp.maximum(n_done, 1), jnp.nan
        )
        metrics["ep_len_mean"] = jnp.where(
            n_done > 0,
            (chunk.episode_length.astype(jnp.float32) * done_f).sum()
            / jnp.maximum(n_done, 1),
            jnp.nan,
        )
        metrics["n_episodes"] = n_done
        if self.reward_fn is not None:
            metrics["relabeled_rew_mean"] = rews.mean()
            metrics["true_rew_mean"] = true_rews.mean()

        new_state = common.RLState(
            variables={**state.variables, "params": params},
            opt_state=opt_state,
            env_state=env_state,
            key=key,
            timesteps=state.timesteps + T * B,
            n_updates=state.n_updates + 1,
            reward_norm=reward_norm,
        )
        if self.return_transitions:
            # Return the raw [T, B] rollout chunk (true env rewards, with
            # terminated/truncated split intact). Consumers flatten for replay
            # storage (adversarial trainer, reference common.py:422-425) or cut
            # episodes (preference comparisons' AgentTrainer buffering,
            # reference preference_comparisons.py:231-307). Policy aux is
            # dropped to keep the returned pytree lean.
            out_chunk = chunk.replace(rews=true_rews, aux={})
            return new_state, metrics, out_chunk
        return new_state, metrics

    # -- host loop ---------------------------------------------------------
    def learn(
        self,
        state: common.RLState,
        total_timesteps: int,
        reward_params: Any = None,
        callback: Optional[Callable[[common.RLState, Dict[str, float]], None]] = None,
        logger=None,
        log_prefix: str = "rollout",
    ) -> common.RLState:
        steps_per_iter = self.config.n_steps * self.venv.num_envs
        n_iters = max(1, int(np.ceil(total_timesteps / steps_per_iter)))
        for _ in range(n_iters):
            out = self._train_step_jit(state, reward_params)
            state, metrics = out[0], out[1]
            if callback is not None or logger is not None:
                host_metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
                if logger is not None:
                    for k, v in host_metrics.items():
                        logger.record(f"{log_prefix}/{k}", v)
                    logger.dump(step=int(state.timesteps))
                if callback is not None:
                    callback(state, host_metrics)
        # Join any overlapped background collection before returning: the
        # caller commonly evaluates on the same venv next, and a live
        # collect thread stepping it concurrently would race.
        self.discard_pending_collection()
        return state

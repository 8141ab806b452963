"""Adversarial imitation learning core (GAIL/AIRL common loop).

Counterpart of reference ``algorithms/adversarial/common.py`` (632 LoC,
``AdversarialTrainer``). The training loop alternates:

    for each round (total_timesteps // gen_train_timesteps):
        train_gen:  generator PPO trains `gen_train_timesteps` env steps on
                    rewards relabeled by the CURRENT reward net; fresh rollout
                    transitions land in the generator replay buffer
                    (reference common.py:391-425)
        train_disc x n_disc_updates_per_round:
                    binary-cross-entropy discriminator step on an equal mix
                    of expert and generator batches (reference common.py:317-389,
                    521-632)

TPU-native collapse of the reference's three hot loops (SURVEY §3.1):
rollout + reward relabel + PPO update are ONE jitted program (rl/ppo.py
with ``reward_fn``), and each disc update is another jitted program that
samples expert/generator batches from HBM, evaluates the reward net on the
doubled batch, and steps the disc optimizer — there is no per-env-step
host call and no numpy<->device copy anywhere in the round.

Subclass contract (GAIL/AIRL): ``logits_expert_is_high`` maps reward-net
outputs (+ policy log-probs for AIRL) to discriminator logits where high
means "expert", and ``reward_train_fn``/``reward_test_fn`` define the reward
used for generator training / for transfer evaluation
(reference common.py:269-315).
"""

from __future__ import annotations

import abc
import functools
from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from imitation_tpu.algorithms import base
from imitation_tpu.data import types
from imitation_tpu.data.rollout import chunk_to_transitions as rollout_chunk_to_transitions
from imitation_tpu.data.buffer import BufferState, ReplayBuffer
from imitation_tpu.envs.vector import VectorEnv
from imitation_tpu.models.policies import ActorCriticPolicy
from imitation_tpu.rewards.reward_nets import RewardNet
from imitation_tpu.rl import common as rl_common
from imitation_tpu.rl.ppo import PPO, PPOConfig
from imitation_tpu.rl.sac import SAC
from imitation_tpu.util.logger import HierarchicalLogger


def compute_train_stats(
    disc_logits_expert_is_high: jnp.ndarray,
    labels_expert_is_one: jnp.ndarray,
    disc_loss: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Discriminator diagnostics (reference common.py:27-92)."""
    bin_is_generated_pred = disc_logits_expert_is_high < 0
    bin_is_generated_true = labels_expert_is_one == 0
    bin_is_expert_true = labels_expert_is_one == 1
    int_is_generated_pred = bin_is_generated_pred.astype(jnp.float32)
    int_is_generated_true = bin_is_generated_true.astype(jnp.float32)
    n_labels = labels_expert_is_one.shape[0]
    n_generated = int_is_generated_true.sum()
    n_expert = n_labels - n_generated
    pct_expert = n_expert / n_labels
    correct = (bin_is_generated_pred == bin_is_generated_true).astype(jnp.float32)
    acc = correct.mean()
    expert_acc = jnp.where(
        n_expert > 0,
        (correct * bin_is_expert_true).sum() / jnp.maximum(n_expert, 1),
        jnp.nan,
    )
    generated_acc = jnp.where(
        n_generated > 0,
        (correct * bin_is_generated_true).sum() / jnp.maximum(n_generated, 1),
        jnp.nan,
    )
    pct_expert_pred = 1.0 - int_is_generated_pred.mean()
    # entropy of the Bernoulli implied by each logit
    p = jax.nn.sigmoid(disc_logits_expert_is_high)
    entropy = -(
        p * jnp.log(jnp.clip(p, 1e-12)) + (1 - p) * jnp.log(jnp.clip(1 - p, 1e-12))
    ).mean()
    return {
        "disc_loss": disc_loss,
        "disc_acc": acc,
        "disc_acc_expert": expert_acc,
        "disc_acc_gen": generated_acc,
        "disc_entropy": entropy,
        "disc_proportion_expert_true": pct_expert,
        "disc_proportion_expert_pred": pct_expert_pred,
    }


@struct.dataclass
class DiscState:
    variables: Any  # reward net variables
    opt_state: Any
    key: jax.Array
    step: jnp.ndarray  # int32


class AdversarialTrainer(base.DemonstrationAlgorithm):
    """Base class for adversarial imitation (reference common.py:95-632)."""

    def __init__(
        self,
        *,
        demonstrations: base.AnyDemonstrations,
        demo_batch_size: int,
        venv: VectorEnv,
        gen_algo: Optional[PPO] = None,
        reward_net: RewardNet = None,
        policy: Optional[ActorCriticPolicy] = None,
        gen_config: Optional[PPOConfig] = None,
        demo_minibatch_size: Optional[int] = None,
        n_disc_updates_per_round: int = 2,
        disc_opt_kwargs: Optional[Mapping[str, Any]] = None,
        gen_train_timesteps: Optional[int] = None,
        gen_replay_buffer_capacity: Optional[int] = None,
        custom_logger: Optional[HierarchicalLogger] = None,
        allow_variable_horizon: bool = False,
        seed: int = 0,
    ):
        self.demo_batch_size = demo_batch_size
        self.demo_minibatch_size = demo_minibatch_size or demo_batch_size
        if self.demo_batch_size % self.demo_minibatch_size != 0:
            raise ValueError(
                "demo_batch_size must be divisible by demo_minibatch_size."
            )
        self.venv = venv
        self.reward_net = reward_net
        self.n_disc_updates_per_round = n_disc_updates_per_round
        self._demo_store: Optional[base.DemonstrationStore] = None
        super().__init__(
            demonstrations=demonstrations,
            custom_logger=custom_logger,
            allow_variable_horizon=allow_variable_horizon,
        )

        # Generator: PPO with the learned-reward relabel fused in
        # (replaces reference's BufferingWrapper+RewardVecEnvWrapper stack,
        # common.py:229-241). Off-policy generators (SAC) relabel at replay
        # sample time instead — the reference's ReplayBufferRewardWrapper
        # semantics (ingredients/rl.py:163-196).
        if gen_algo is None:
            policy = policy or ActorCriticPolicy(
                observation_space=venv.observation_space,
                action_space=venv.action_space,
            )
            gen_algo = PPO(
                venv,
                policy,
                gen_config or PPOConfig(),
                reward_fn=self._reward_train_relabel_fn,
                return_transitions=True,
                seed=seed,
            )
        elif isinstance(gen_algo, SAC):
            def _relabel_batch(reward_params, batch):
                rews = self._reward_train_relabel_fn(
                    reward_params, batch.obs, batch.acts, batch.next_obs,
                    batch.dones,
                )
                return batch.replace(rews=rews)

            gen_algo.relabel_fn = _relabel_batch
            gen_algo.return_transitions = True
            gen_algo.rebind()
        else:
            gen_algo.reward_fn = self._reward_train_relabel_fn
            gen_algo.return_transitions = True
            gen_algo.rebind()
        self.gen_algo = gen_algo

        # One generator round produces n_steps * num_envs transitions
        # (reference common.py:246-253: defaults to one on-policy batch;
        # off-policy generators use train_freq like SB3's train_freq rollout).
        self._gen_steps_per_iter = (
            getattr(self.gen_algo.config, "n_steps", None)
            or self.gen_algo.config.train_freq
        ) * venv.num_envs
        if gen_train_timesteps is None:
            gen_train_timesteps = self._gen_steps_per_iter
        self.gen_train_timesteps = gen_train_timesteps
        if gen_replay_buffer_capacity is None:
            gen_replay_buffer_capacity = self.gen_train_timesteps
        self._gen_replay_buffer = ReplayBuffer(gen_replay_buffer_capacity)
        self._gen_buffer_state: Optional[BufferState] = None

        # Discriminator optimizer (reference default Adam lr 1e-3? -> SB3
        # torch.optim.Adam defaults; reference uses disc_opt_cls=th.optim.Adam).
        disc_opt_kwargs = dict(disc_opt_kwargs or {})
        lr = disc_opt_kwargs.pop("lr", disc_opt_kwargs.pop("learning_rate", 1e-3))
        self.disc_optimizer = optax.adam(lr, **disc_opt_kwargs)

        k_init, k_disc = jax.random.split(jax.random.key(seed ^ 0x5EED))
        reward_variables = self.reward_net.init_variables(k_init)
        self.disc_state = DiscState(
            variables=reward_variables,
            opt_state=self.disc_optimizer.init(reward_variables["params"]),
            key=k_disc,
            step=jnp.zeros((), jnp.int32),
        )
        self.gen_state: Optional[rl_common.RLState] = None
        self._run_rounds_jit = None
        self._disc_step_jit = jax.jit(self._disc_step)
        self._disc_multi_jit = None
        self._chunk_to_transitions_jit = jax.jit(rollout_chunk_to_transitions)
        self._buffer_store_jit = jax.jit(self._gen_replay_buffer.store)
        self._global_step = 0

    # -- demonstration handling -------------------------------------------
    def set_demonstrations(self, demonstrations: base.AnyDemonstrations) -> None:
        if isinstance(demonstrations, (list, tuple)) and demonstrations and isinstance(
            demonstrations[0], types.Trajectory
        ):
            self._check_fixed_horizon(len(t) for t in demonstrations)
        self._demo_store = base.DemonstrationStore.from_demonstrations(demonstrations)
        if self._demo_store.num_samples < self.demo_batch_size:
            raise ValueError(
                f"demo_batch_size={self.demo_batch_size} exceeds demonstration "
                f"size {self._demo_store.num_samples}"
            )
        # The disc step closes over the demo store (baked in as trace-time
        # constants) — re-jit when demonstrations are replaced post-hoc.
        if getattr(self, "_disc_step_jit", None) is not None:
            self._disc_step_jit = jax.jit(self._disc_step)
        self._disc_multi_jit = None
        self._run_rounds_jit = None  # fused program embeds the disc step too

    @property
    def policy(self) -> ActorCriticPolicy:
        return self.gen_algo.policy

    @property
    def policy_variables(self):
        assert self.gen_state is not None, "call train() first"
        return self.gen_state.variables

    # -- subclass contract -------------------------------------------------
    @abc.abstractmethod
    def logits_expert_is_high(
        self,
        reward_variables: Any,
        obs,
        acts,
        next_obs,
        dones,
        log_policy_act_prob: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Discriminator logits; high = classified expert (reference :269-300)."""

    @abc.abstractmethod
    def reward_train_fn(self) -> rl_common.RelabelRewardFn:
        """Reward used to train the generator (reference .reward_train)."""

    def reward_test_fn(self) -> rl_common.RelabelRewardFn:
        """Reward for transfer evaluation (reference .reward_test);
        defaults to the train reward."""
        return self.reward_train_fn()

    @property
    def needs_policy_log_prob(self) -> bool:
        """AIRL needs log pi(a|s) inside the disc logit; GAIL does not."""
        return False

    # -- fused reward relabel fn for the generator ------------------------
    def _reward_train_relabel_fn(self, reward_params, obs, acts, next_obs, dones):
        return self.reward_train_fn()(reward_params, obs, acts, next_obs, dones)

    # -- discriminator step ------------------------------------------------
    def _disc_step(
        self,
        disc_state: DiscState,
        gen_buffer_state: BufferState,
        policy_variables: Any,
        demo_batch: types.TransitionBatch,
    ) -> Tuple[DiscState, Dict[str, jnp.ndarray]]:
        """One jitted BCE discriminator update on expert+gen half-batches
        (reference train_disc, common.py:317-389 + batch assembly :521-632).

        ``demo_batch`` is a jit ARGUMENT (not a closed-over constant — that
        would embed the whole demo set in the HLO, which remote TPU
        backends pay for in lowering-time device fetches and per-dataset
        recompiles).

        When ``demo_minibatch_size < demo_batch_size``, gradients are
        accumulated over ``[expert_mb; gen_mb]`` minibatch slices with the
        loss renormalized by ``mb / demo_batch_size`` and a single optimizer
        step taken at the end — the reference's grad-accumulation semantics
        (common.py:346-372, 584-632), expressed as one ``lax.scan`` so the
        device never materializes more than one minibatch of activations.
        """
        key, k_expert, k_gen = jax.random.split(disc_state.key, 3)
        e_idx = jax.random.randint(
            k_expert, (self.demo_batch_size,), 0, demo_batch.batch_size
        )
        expert = demo_batch.take(e_idx)
        gen = self._gen_replay_buffer.sample(
            gen_buffer_state, k_gen, self.demo_batch_size
        )
        B = self.demo_batch_size
        mb = self.demo_minibatch_size
        k = B // mb
        obs = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), expert.obs, gen.obs)
        acts = jnp.concatenate([expert.acts, gen.acts])
        next_obs = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b]), expert.next_obs, gen.next_obs
        )
        dones = jnp.concatenate([expert.dones, gen.dones])

        if self.needs_policy_log_prob:
            # log pi(a|s) under the current generator policy, no gradient
            # (reference _get_log_policy_act_prob, common.py:476-519).
            if isinstance(self.gen_algo, SAC):
                log_prob = self.gen_algo.log_prob_fn()(policy_variables, obs, acts)
            else:
                dist = self.policy.distribution(policy_variables, obs)
                if self.policy.action_space.is_discrete:
                    log_prob = dist.log_prob(acts.astype(jnp.int32))
                else:
                    log_prob = dist.log_prob(acts.reshape(acts.shape[0], -1))
            log_prob = jax.lax.stop_gradient(log_prob)
        else:
            log_prob = None

        # Slice the doubled batch into k minibatches of [expert_mb; gen_mb].
        def to_mb(x):
            # [2B, ...] with expert rows first -> [k, 2*mb, ...]
            e = x[:B].reshape((k, mb) + x.shape[1:])
            g = x[B:].reshape((k, mb) + x.shape[1:])
            return jnp.concatenate([e, g], axis=1)

        obs_mb = jax.tree.map(to_mb, obs)
        acts_mb = to_mb(acts)
        next_obs_mb = jax.tree.map(to_mb, next_obs)
        dones_mb = to_mb(dones)
        log_prob_mb = to_mb(log_prob) if log_prob is not None else None
        labels_mb = jnp.concatenate([jnp.ones(mb), jnp.zeros(mb)])
        labels = jnp.concatenate([jnp.ones(B), jnp.zeros(B)])

        def minibatch_loss(params, o, a, no, d, lp):
            variables = {**disc_state.variables, "params": params}
            logits = self.logits_expert_is_high(variables, o, a, no, d, lp)
            # Renormalize so the k accumulated grads sum to the full-batch
            # mean-BCE gradient (reference common.py:366-369).
            loss = optax.sigmoid_binary_cross_entropy(logits, labels_mb).mean()
            return loss * (mb / B), logits

        grad_fn = jax.value_and_grad(minibatch_loss, has_aux=True)
        params0 = disc_state.variables["params"]

        def accum_body(grads_acc, inp):
            o, a, no, d, lp = inp
            (loss_i, logits_i), g = grad_fn(params0, o, a, no, d, lp)
            grads_acc = jax.tree.map(jnp.add, grads_acc, g)
            return grads_acc, (loss_i, logits_i)

        zero_grads = jax.tree.map(jnp.zeros_like, params0)
        lp_scan = (
            log_prob_mb if log_prob_mb is not None
            else jnp.zeros((k, 2 * mb)) * jnp.nan
        )
        if log_prob_mb is None:
            # Keep the scan signature uniform; GAIL's logit fn ignores lp.
            def accum_body(grads_acc, inp):  # noqa: F811
                o, a, no, d, _ = inp
                (loss_i, logits_i), g = grad_fn(params0, o, a, no, d, None)
                grads_acc = jax.tree.map(jnp.add, grads_acc, g)
                return grads_acc, (loss_i, logits_i)

        grads, (losses, logits_k) = jax.lax.scan(
            accum_body, zero_grads,
            (obs_mb, acts_mb, next_obs_mb, dones_mb, lp_scan),
        )
        loss = losses.sum()  # == full-batch mean BCE
        # [k, 2mb] -> [2B] reordered to [all expert; all gen] to match labels.
        logits = jnp.concatenate(
            [logits_k[:, :mb].reshape(B), logits_k[:, mb:].reshape(B)]
        )
        updates, opt_state = self.disc_optimizer.update(
            grads, disc_state.opt_state, disc_state.variables["params"]
        )
        params = optax.apply_updates(disc_state.variables["params"], updates)
        stats = compute_train_stats(logits, labels, loss)
        variables = {**disc_state.variables, "params": params}
        if "stats" in variables:
            # Fold this batch into the reward net's input-normalizer running
            # stats (reference: RunningNorm input layers update in training
            # mode during every disc forward, util/networks.py:98-134).
            _, mutated = self.reward_net.apply(
                variables, obs, acts, next_obs, dones,
                update_stats=True, mutable=["stats"],
            )
            variables = {**variables, **mutated}
        new_state = DiscState(
            variables=variables,
            opt_state=opt_state,
            key=key,
            step=disc_state.step + 1,
        )
        return new_state, stats

    def train_disc(self, sync: bool = True) -> Mapping[str, Any]:
        """One discriminator update using current buffers (reference :317-389).

        ``sync=False`` returns device arrays without blocking, letting callers
        pipeline many rounds of async dispatches (bench / throughput mode).
        """
        if self._gen_buffer_state is None:
            raise RuntimeError(
                "No generator samples for training. Call `train_gen()` first.",
            )
        self.disc_state, stats = self._disc_step_jit(
            self.disc_state,
            self._gen_buffer_state,
            self._current_policy_variables(),
            self._demo_store.batch,
        )
        if not sync:
            return stats
        return {k: float(v) for k, v in jax.device_get(stats).items()}

    def _disc_multi(self, disc_state, gen_buffer_state, policy_variables,
                    demo_batch, n: int):
        """``n`` discriminator updates as ONE traced ``lax.scan`` program.

        On a remote/tunneled accelerator each dispatched program costs a
        network round trip; scanning the per-update step collapses the
        reference's ``n_disc_updates_per_round`` separate updates
        (reference common.py:446-448) into a single dispatch. Per-update
        RNG-driven batch sampling semantics are unchanged — the scan body
        IS ``_disc_step``.
        """
        def body(ds, _):
            ds, stats = self._disc_step(
                ds, gen_buffer_state, policy_variables, demo_batch
            )
            return ds, stats

        disc_state, stats = jax.lax.scan(
            body, disc_state, jnp.arange(n)
        )
        return disc_state, stats

    def train_disc_rounds(self, n: Optional[int] = None, sync: bool = True):
        """Runs ``n`` (default ``n_disc_updates_per_round``) disc updates in
        one device program; returns per-update stats stacked on axis 0."""
        if self._gen_buffer_state is None:
            raise RuntimeError(
                "No generator samples for training. Call `train_gen()` first.",
            )
        n = n or self.n_disc_updates_per_round
        if self._disc_multi_jit is None:
            self._disc_multi_jit = jax.jit(self._disc_multi, static_argnums=4)
        timer = getattr(self.gen_algo, "phase_timer", None)
        if timer is not None:
            # Profiling mode (PPO.phase_timer set): attribute disc time with
            # a fetch barrier, like the generator's device_update phase.
            with timer.phase("disc_update"):
                self.disc_state, stats = self._disc_multi_jit(
                    self.disc_state,
                    self._gen_buffer_state,
                    self._current_policy_variables(),
                    self._demo_store.batch,
                    n,
                )
                jax.device_get(self.disc_state.variables["params"])
        else:
            self.disc_state, stats = self._disc_multi_jit(
                self.disc_state,
                self._gen_buffer_state,
                self._current_policy_variables(),
                self._demo_store.batch,
                n,
            )
        if not sync:
            return stats
        return jax.device_get(stats)

    def _current_policy_variables(self):
        if self.gen_state is None:
            self.gen_state = self.gen_algo.init_state()
        return self.gen_state.variables

    # -- generator warm start ----------------------------------------------
    def warm_start_generator(self, variables: Any) -> None:
        """Loads pre-trained policy variables into the generator before
        training (reference agent_path warm start, ingredients/rl.py:199-231)."""
        if self.gen_state is None:
            self.gen_state = self.gen_algo.init_state()
        if hasattr(self.gen_state, "actor_params"):  # SACState
            self.gen_state = self.gen_state.replace(
                actor_params=variables["params"]
            )
        else:
            self.gen_state = self.gen_state.replace(variables=variables)
        # An in-flight background collection (PPOConfig.overlap_collection)
        # was gathered under the replaced policy — drop it.
        if hasattr(self.gen_algo, "discard_pending_collection"):
            self.gen_algo.discard_pending_collection()

    # -- generator step ----------------------------------------------------
    def train_gen(
        self, total_timesteps: Optional[int] = None, sync: bool = True
    ) -> Mapping[str, Any]:
        """Train the generator on relabeled rewards; refill the gen buffer
        (reference train_gen, common.py:391-425)."""
        if total_timesteps is None:
            total_timesteps = self.gen_train_timesteps
        if self.gen_state is None:
            self.gen_state = self.gen_algo.init_state()
        n_iters = max(1, int(np.ceil(total_timesteps / self._gen_steps_per_iter)))
        metrics = {}
        for _ in range(n_iters):
            self.gen_state, metrics_dev, chunk = self.gen_algo._train_step_jit(
                self.gen_state, self.disc_state.variables
            )
            if isinstance(chunk, types.TransitionBatch):
                transitions = chunk  # off-policy generators return these directly
            else:
                transitions = self._chunk_to_transitions_jit(chunk)
            if self._gen_buffer_state is None:
                self._gen_buffer_state = self._gen_replay_buffer.init_state(transitions)
            self._gen_buffer_state = self._buffer_store_jit(
                self._gen_buffer_state, transitions
            )
            metrics = metrics_dev
        if not sync:
            return metrics
        return {k: float(v) for k, v in jax.device_get(metrics).items()}

    # -- fused multi-round program -----------------------------------------
    def _example_transitions(self) -> types.TransitionBatch:
        obs_space, act_space = self.venv.observation_space, self.venv.action_space
        obs = jnp.zeros((1,) + obs_space.shape, jnp.float32)
        if act_space.is_discrete:
            acts = jnp.zeros((1,), jnp.int32)
        else:
            acts = jnp.zeros((1,) + act_space.shape, jnp.float32)
        return types.TransitionBatch(
            obs=obs, acts=acts, next_obs=obs,
            dones=jnp.zeros((1,)), rews=jnp.zeros((1,)),
        )

    def _round_step(self, carry, _, demo_batch):
        """One adversarial round, fully traced: generator train step +
        buffer refill + n_disc_updates_per_round discriminator steps."""
        gen_state, disc_state, buffer_state = carry
        gen_state, gen_metrics, chunk = self.gen_algo.train_step(
            gen_state, disc_state.variables
        )
        if isinstance(chunk, types.TransitionBatch):
            transitions = chunk  # off-policy generators return these directly
        else:
            transitions = rollout_chunk_to_transitions(chunk)
        buffer_state = self._gen_replay_buffer.store(buffer_state, transitions)

        def disc_body(ds, _):
            ds, stats = self._disc_step(
                ds, buffer_state, gen_state.variables, demo_batch
            )
            return ds, stats

        disc_state, disc_stats = jax.lax.scan(
            disc_body, disc_state, jnp.arange(self.n_disc_updates_per_round)
        )
        metrics = {f"gen/{k}": v for k, v in gen_metrics.items()}
        metrics.update({f"disc/{k}": v.mean() for k, v in disc_stats.items()})
        return (gen_state, disc_state, buffer_state), metrics

    def train_fused(
        self,
        total_timesteps: int,
        rounds_per_sync: int = 8,
    ) -> None:
        """Fused training: ``rounds_per_sync`` adversarial rounds run as ONE
        jitted ``lax.scan`` program — zero host round trips between rounds.

        This is the speed-of-light path for device envs (the reference's
        equivalent loop crosses the host/device boundary thousands of times
        per round, SURVEY §3.1); ``train()`` remains the step-by-step API
        with per-round logging.
        """
        if getattr(self.gen_algo, "is_host_env", False):
            raise ValueError("train_fused requires a device (pure-JAX) env")
        n_rounds = total_timesteps // self.gen_train_timesteps
        assert n_rounds >= 1
        if self.gen_state is None:
            self.gen_state = self.gen_algo.init_state()
        if self._gen_buffer_state is None:
            self._gen_buffer_state = self._gen_replay_buffer.init_state(
                self._example_transitions()
            )

        # The jitted multi-round program is built ONCE and cached on the
        # trainer: defining it per call would create a fresh jax.jit wrapper
        # each time, whose cache never hits — every train_fused call would
        # recompile the whole program (measured 17x slowdown).
        if self._run_rounds_jit is None:

            @functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(0,))
            def run_rounds(carry, k, demo_batch):
                step = lambda c, x: self._round_step(c, x, demo_batch)
                return jax.lax.scan(step, carry, None, length=k)

            self._run_rounds_jit = run_rounds
        run_rounds = self._run_rounds_jit

        def unalias(tree):
            # Donation rejects a buffer appearing twice in the carry; freshly
            # built states can alias (jax caches small constants like
            # zero-scalars across leaves). Copy duplicates once up front —
            # every later carry comes out of the previous execution with
            # distinct buffers.
            seen = set()

            def f(x):
                if not isinstance(x, jax.Array):
                    return x
                try:
                    ptr = x.unsafe_buffer_pointer()
                except Exception:
                    ptr = id(x)
                if ptr in seen:
                    return jnp.array(x, copy=True)
                seen.add(ptr)
                return x

            return jax.tree.map(f, tree)

        carry = unalias(
            (self.gen_state, self.disc_state, self._gen_buffer_state)
        )
        done_rounds = 0
        while done_rounds < n_rounds:
            k = min(rounds_per_sync, n_rounds - done_rounds)
            carry, metrics = run_rounds(carry, k, self._demo_store.batch)
            done_rounds += k
            host = {k2: float(np.asarray(v).mean()) for k2, v in jax.device_get(metrics).items()}
            for k2, v in host.items():
                self.logger.record(f"mean/{k2}", v)
            self._global_step += k
            self.logger.dump(self._global_step)
        self.gen_state, self.disc_state, self._gen_buffer_state = carry

    # -- outer loop --------------------------------------------------------
    def train(
        self,
        total_timesteps: int,
        callback: Optional[Callable[[int], None]] = None,
    ) -> None:
        """Alternating adversarial training (reference common.py:427-461)."""
        n_rounds = total_timesteps // self.gen_train_timesteps
        assert n_rounds >= 1, (
            "No updates (need at least "
            f"{self.gen_train_timesteps} timesteps, have only "
            f"total_timesteps={total_timesteps})!"
        )
        for r in range(n_rounds):
            # Dispatch generator round + all disc updates first, then fetch
            # every metric in ONE device_get: on a remote/tunneled chip each
            # blocking sync is a network round trip, so the reference's
            # per-update fetch pattern (1 gen + n_disc syncs per round)
            # collapses to a single sync per round.
            gen_metrics_dev = self.train_gen(self.gen_train_timesteps, sync=False)
            disc_stats_dev = self.train_disc_rounds(sync=False)
            gen_metrics, disc_stats = jax.device_get(
                (gen_metrics_dev, disc_stats_dev)
            )
            with self.logger.accumulate_means("gen"):
                for k, v in gen_metrics.items():
                    self.logger.record(k, float(v))
            for i in range(self.n_disc_updates_per_round):
                with self.logger.accumulate_means("disc"):
                    for k, v in disc_stats.items():
                        self.logger.record(k, float(v[i]))
            self._global_step += 1
            if callback:
                callback(r)
            self.logger.dump(self._global_step)
        # Join any overlapped background collection before returning: callers
        # commonly evaluate on the SAME venv next, and a live collect thread
        # stepping it concurrently would race (host envs are not thread-safe).
        if hasattr(self.gen_algo, "discard_pending_collection"):
            self.gen_algo.discard_pending_collection()

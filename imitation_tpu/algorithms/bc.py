"""Behavioral Cloning: supervised policy learning on (obs, act) pairs.

Counterpart of reference ``algorithms/bc.py`` (510 LoC). Loss per reference
``BehaviorCloningLossCalculator`` (bc.py:94-156):

    L = -E[log pi(a|s)] - ent_weight * H(pi(.|s)) + l2_weight * ||theta||^2

TPU-native structure: demonstrations live in HBM as one ``TransitionBatch``;
an epoch is one jitted ``lax.scan`` over shuffled minibatch indices — there
is no per-batch host round trip, host code only sees per-epoch stacked
metrics. Gradient accumulation (reference bc.py:443-510: ``minibatch_size``
dividing ``batch_size``, loss renormalized at :501) is an inner scan of
microbatch gradients averaged before the optimizer step — bitwise-equivalent
to the full batch for mean losses, and memory-bounded for huge batches.

Periodic rollout evaluation (reference ``RolloutStatsComputer``, bc.py:171)
is available through ``log_rollouts_venv``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Mapping, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from imitation_tpu.algorithms import base
from imitation_tpu.data import rollout as rollout_mod
from imitation_tpu.data import types
from imitation_tpu.envs.base import Space
from imitation_tpu.envs.vector import VectorEnv
from imitation_tpu.models.policies import ActorCriticPolicy, FeedForward32Policy
from imitation_tpu.util.logger import HierarchicalLogger


@struct.dataclass
class BCState:
    variables: Any
    opt_state: Any
    key: jax.Array
    num_samples_so_far: jnp.ndarray  # int32
    num_batches: jnp.ndarray  # int32


@struct.dataclass
class BCTrainingMetrics:
    """Container for BC metrics (reference bc.py:80-91)."""

    neglogp: jnp.ndarray
    entropy: jnp.ndarray
    ent_loss: jnp.ndarray
    prob_true_act: jnp.ndarray
    l2_norm: jnp.ndarray
    l2_loss: jnp.ndarray
    loss: jnp.ndarray


def loss_calculator(
    policy: ActorCriticPolicy,
    ent_weight: float,
    l2_weight: float,
) -> Callable[[Any, Any, jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, BCTrainingMetrics]]:
    """Builds the BC loss fn (reference BehaviorCloningLossCalculator)."""

    def loss_fn(params, extra_variables, obs, acts):
        variables = {**extra_variables, "params": params}
        log_prob, entropy, _ = policy.evaluate_actions(variables, obs, acts)
        prob_true_act = jnp.exp(log_prob).mean()
        neglogp = -log_prob.mean()
        ent = entropy.mean()
        ent_loss = -ent_weight * ent
        l2_norms = [jnp.sum(jnp.square(p)) for p in jax.tree.leaves(params)]
        l2_norm = jnp.sqrt(sum(l2_norms))
        # Matches reference bc.py:150: l2_loss = l2_weight * l2_norm (not squared).
        l2_loss = l2_weight * l2_norm
        loss = neglogp + ent_loss + l2_loss
        metrics = BCTrainingMetrics(
            neglogp=neglogp,
            entropy=ent,
            ent_loss=ent_loss,
            prob_true_act=prob_true_act,
            l2_norm=l2_norm,
            l2_loss=l2_loss,
            loss=loss,
        )
        return loss, metrics

    return loss_fn


class BC(base.DemonstrationAlgorithm):
    """Behavioral cloning (reference bc.py:268-510)."""

    def __init__(
        self,
        *,
        observation_space: Space,
        action_space: Space,
        rng: Optional[Union[int, np.random.Generator]] = None,
        demonstrations: Optional[base.AnyDemonstrations] = None,
        policy: Optional[ActorCriticPolicy] = None,
        batch_size: int = 32,
        minibatch_size: Optional[int] = None,
        optimizer_kwargs: Optional[Mapping[str, Any]] = None,
        ent_weight: float = 1e-3,
        l2_weight: float = 0.0,
        custom_logger: Optional[HierarchicalLogger] = None,
        allow_variable_horizon: bool = False,
    ):
        self.observation_space = observation_space
        self.action_space = action_space
        self.batch_size = batch_size
        self.minibatch_size = minibatch_size or batch_size
        if self.batch_size % self.minibatch_size != 0:
            raise ValueError("batch_size must be a multiple of minibatch_size.")
        self._demo_store: Optional[base.DemonstrationStore] = None
        super().__init__(
            demonstrations=demonstrations,
            custom_logger=custom_logger,
            allow_variable_horizon=allow_variable_horizon,
        )
        self._policy = policy or FeedForward32Policy(observation_space, action_space)
        optimizer_kwargs = dict(optimizer_kwargs or {})
        lr = optimizer_kwargs.pop("lr", optimizer_kwargs.pop("learning_rate", 1e-3))
        self.optimizer = optax.adam(lr, **optimizer_kwargs)
        self.ent_weight = ent_weight
        self.l2_weight = l2_weight
        self.loss_fn = loss_calculator(self._policy, ent_weight, l2_weight)

        seed = 0 if rng is None else (
            int(rng.integers(0, 2**31 - 1)) if isinstance(rng, np.random.Generator) else int(rng)
        )
        self._init_key = jax.random.key(seed)
        self.state = self._init_state()
        self._epoch_fn_cache: Dict[int, Callable] = {}

    def _init_state(self) -> BCState:
        k_init, key = jax.random.split(self._init_key)
        variables = self._policy.init(k_init)
        opt_state = self.optimizer.init(variables["params"])
        return BCState(
            variables=variables,
            opt_state=opt_state,
            key=key,
            num_samples_so_far=jnp.zeros((), jnp.int32),
            num_batches=jnp.zeros((), jnp.int32),
        )

    # -- demonstrations ----------------------------------------------------
    def set_demonstrations(self, demonstrations: base.AnyDemonstrations) -> None:
        self._demo_store = base.DemonstrationStore.from_demonstrations(demonstrations)
        # Demos are jit arguments (not baked-in constants), so cached epoch
        # programs stay valid across demo swaps; jit recompiles only if the
        # demo SHAPES change (DAgger growing its dataset each round).

    @property
    def policy(self) -> ActorCriticPolicy:
        return self._policy

    @property
    def policy_variables(self):
        return self.state.variables

    # -- training ----------------------------------------------------------
    def _make_epoch_fn(self, n_batches_in_call: int):
        """Jitted scan over ``n_batches_in_call`` minibatches of indices.

        The demonstration batch is a jit ARGUMENT, not a closed-over
        constant: embedding device arrays as constants forces lowering to
        fetch them to host and ship them inside the HLO (slow on remote
        TPU backends) and recompiles whenever demos change.
        """
        n_micro = self.batch_size // self.minibatch_size
        grad_fn = jax.value_and_grad(self.loss_fn, has_aux=True)

        def epoch_fn(state: BCState, idx: jnp.ndarray, demo):
            def batch_step(carry, idx_row):
                variables, opt_state = carry
                params = variables["params"]
                extra = {k: v for k, v in variables.items() if k != "params"}
                mb = demo.take(idx_row)  # [batch_size, ...]

                if n_micro == 1:
                    (loss, metrics), grads = grad_fn(params, extra, mb.obs, mb.acts)
                else:
                    micro = jax.tree.map(
                        lambda x: x.reshape(
                            (n_micro, self.minibatch_size) + x.shape[1:]
                        ),
                        (mb.obs, mb.acts),
                    )

                    def micro_step(acc, xs):
                        o, a = xs
                        (loss, metrics), grads = grad_fn(params, extra, o, a)
                        acc_g, acc_m = acc
                        acc_g = jax.tree.map(jnp.add, acc_g, grads)
                        acc_m = jax.tree.map(jnp.add, acc_m, metrics)
                        return (acc_g, acc_m), None

                    zero_g = jax.tree.map(jnp.zeros_like, params)
                    zero_m = BCTrainingMetrics(*([jnp.zeros(())] * 7))
                    (sum_g, sum_m), _ = jax.lax.scan(
                        micro_step, (zero_g, zero_m), micro
                    )
                    grads = jax.tree.map(lambda g: g / n_micro, sum_g)
                    metrics = jax.tree.map(lambda m: m / n_micro, sum_m)

                updates, opt_state = self.optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return ({**extra, "params": params}, opt_state), metrics

            (variables, opt_state), metrics = jax.lax.scan(
                batch_step, (state.variables, state.opt_state), idx
            )
            new_state = BCState(
                variables=variables,
                opt_state=opt_state,
                key=state.key,
                num_samples_so_far=state.num_samples_so_far
                + n_batches_in_call * self.batch_size,
                num_batches=state.num_batches + n_batches_in_call,
            )
            return new_state, metrics

        return jax.jit(epoch_fn)

    def train(
        self,
        *,
        n_epochs: Optional[int] = None,
        n_batches: Optional[int] = None,
        on_epoch_end: Optional[Callable[[], None]] = None,
        on_batch_end: Optional[Callable[[], None]] = None,
        log_interval: int = 500,
        log_rollouts_venv: Optional[VectorEnv] = None,
        log_rollouts_n_episodes: int = 5,
        progress_bar: bool = False,
        reset_tensorboard: bool = False,
    ) -> None:
        """Train with an epoch or batch budget (reference bc.py:381-510)."""
        if self._demo_store is None:
            raise ValueError("No demonstrations provided.")
        if (n_epochs is not None) == (n_batches is not None):
            raise ValueError("Must provide exactly one of `n_epochs` and `n_batches`.")
        # NormalizeFeaturesExtractor semantics (the reference's tuned
        # bc/dagger configs all use it, config/tuned_hps/bc_*_best_hp_eval
        # .json "features_extractor_class"): RunningNorm stats accumulate
        # from training forwards, converging to the demo distribution. Fold
        # the full demo set once per train() call — without this an
        # unnormalized tanh torso saturates on wide-range obs (e.g. seals
        # x-positions reaching hundreds for fast experts).
        if getattr(self._policy, "normalize_features", False):
            batch = self._demo_store.batch
            out = self._policy.evaluate_actions(
                self.state.variables, batch.obs, batch.acts, update_stats=True
            )
            mutated = out[-1]
            self.state = dataclasses.replace(
                self.state,
                variables={**self.state.variables, **mutated},
            )
        n_per_epoch = self._demo_store.num_samples // self.batch_size
        if n_per_epoch == 0:
            raise ValueError("Not enough demonstrations for one batch.")
        batches_left = n_batches if n_batches is not None else None
        epochs_left = n_epochs if n_epochs is not None else None
        logged_batches = 0

        while (epochs_left is None or epochs_left > 0) and (
            batches_left is None or batches_left > 0
        ):
            key, k_epoch = jax.random.split(self.state.key)
            self.state = dataclasses.replace(self.state, key=key)
            idx = self._demo_store.epoch_indices(k_epoch, self.batch_size)
            if batches_left is not None and idx.shape[0] > batches_left:
                idx = idx[:batches_left]
            n_call = int(idx.shape[0])
            epoch_fn = self._epoch_fn_cache.setdefault(
                n_call, self._make_epoch_fn(n_call)
            )
            self.state, metrics = epoch_fn(self.state, idx, self._demo_store.batch)
            metrics_host = jax.device_get(metrics)
            # Log per log_interval batches (last batch in window, like reference).
            total_batches = int(self.state.num_batches)
            while logged_batches + log_interval <= total_batches:
                logged_batches += log_interval
                i = min(logged_batches - (total_batches - n_call) - 1, n_call - 1)
                if i < 0:
                    i = 0
                with self.logger.accumulate_means("bc"):
                    for f in dataclasses.fields(BCTrainingMetrics):
                        self.logger.record(
                            f.name, float(getattr(metrics_host, f.name)[i])
                        )
                    self.logger.record("samples_so_far", int(self.state.num_samples_so_far))
                    self.logger.record("batch", logged_batches)
                if log_rollouts_venv is not None and log_rollouts_n_episodes > 0:
                    trajs = rollout_mod.generate_trajectories(
                        self._policy.sample_fn(),
                        self.state.variables,
                        log_rollouts_venv,
                        rollout_mod.make_min_episodes(log_rollouts_n_episodes),
                        rng=logged_batches,
                    )
                    stats = rollout_mod.rollout_stats(trajs)
                    with self.logger.accumulate_means("bc"):
                        self.logger.record("rollout/return_mean", stats["return_mean"])
                self.logger.dump(step=total_batches)
            if on_batch_end is not None:
                for _ in range(n_call):
                    on_batch_end()
            if epochs_left is not None:
                epochs_left -= 1
            if batches_left is not None:
                batches_left -= n_call
            if on_epoch_end is not None:
                on_epoch_end()

    # -- persistence -------------------------------------------------------
    def save_policy(self, path: str) -> None:
        from imitation_tpu.policies import serialize as policy_serialize

        policy_serialize.save_policy(path, self._policy, self.state.variables)


def reconstruct_policy(policy_path: str):
    """Reconstruct a saved BC policy (reference bc.py:250-266).

    Returns (policy, variables)."""
    from imitation_tpu.policies.serialize import load_policy_from_path

    return load_policy_from_path(policy_path)

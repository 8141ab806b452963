"""Reward networks and the wrapper algebra.

Flax counterparts of the reference's ``rewards/reward_nets.py`` (1080 LoC).
A reward net is a linen module with signature

    __call__(obs, acts, next_obs, dones, *, update_stats=False) -> rewards [B]

plus a ``predict_processed`` method for the *inference* path. The reference's
two wrapper kinds map onto these two methods:

* **ForwardWrapper** (reference reward_nets.py:275-300) — modifies the
  gradient/training path; here: composition inside ``__call__``
  (e.g. ``ShapedRewardNet``).
* **PredictProcessedWrapper** (reference reward_nets.py:303-353) — modifies
  only inference; here: overriding ``predict_processed``
  (e.g. ``NormalizedRewardNet``, ``AddSTDRewardWrapper``). Training still
  sees the raw forward.

Preprocessing (reference reward_nets.py:109-178 via SB3 ``preprocess_obs``):
discrete spaces one-hot, floats cast to f32, images scaled — done inside the
module so the whole (preprocess -> MLP -> postprocess) pipeline is one fused
XLA program over the full batch.

Implemented nets: BasicRewardNet, CnnRewardNet, BasicPotentialMLP/CNN,
ShapedRewardNet, BasicShapedRewardNet, NormalizedRewardNet, RewardEnsemble,
AddSTDRewardWrapper — the complete inventory of reference §2.2.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Type

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from imitation_tpu.envs.base import Space
from imitation_tpu.models import networks


def preprocess_space(space: Space, x: jnp.ndarray) -> jnp.ndarray:
    """One-hot discrete, flatten + cast continuous — batched, fused."""
    if space.is_discrete:
        return jax.nn.one_hot(x.astype(jnp.int32), space.n, dtype=jnp.float32)
    x = x.astype(jnp.float32)
    if np.issubdtype(np.dtype(space.dtype), np.integer):
        # image-style spaces: scale to [0, 1]
        hi = float(np.max(space.high)) if space.high is not None else 255.0
        x = x / hi
    return x.reshape((x.shape[0], -1))


class RewardNet(nn.Module):
    """Base reward net (reference reward_nets.py:16-224).

    Subclasses implement ``__call__``; ``predict_processed`` defaults to the
    raw forward. Use ``apply(variables, ..., method="predict_processed")``
    for the inference path.
    """

    observation_space: Space
    action_space: Space

    def preprocess(self, obs, acts, next_obs, dones):
        return (
            preprocess_space(self.observation_space, obs),
            preprocess_space(self.action_space, acts),
            preprocess_space(self.observation_space, next_obs),
            dones.astype(jnp.float32),
        )

    def predict_processed(self, obs, acts, next_obs, dones, update_stats: bool = False):
        return self(obs, acts, next_obs, dones)

    # host-convenience (reference .predict, numpy in/out, no grad)
    def predict(self, variables, obs, acts, next_obs, dones) -> np.ndarray:
        out = self.apply(
            variables,
            jnp.asarray(obs),
            jnp.asarray(acts),
            jnp.asarray(next_obs),
            jnp.asarray(dones),
            method="predict_processed",
        )
        return np.asarray(out)

    def init_variables(self, key: jax.Array, batch: int = 2):
        obs = jnp.zeros((batch,) + self.observation_space.shape, jnp.float32)
        if self.action_space.is_discrete:
            acts = jnp.zeros((batch,), jnp.int32)
        else:
            acts = jnp.zeros((batch,) + self.action_space.shape, jnp.float32)
        dones = jnp.zeros((batch,), jnp.float32)
        return self.init(key, obs, acts, obs, dones)


class BasicRewardNet(RewardNet):
    """MLP over any subset of (s, a, s', done).

    Reference: reward_nets.py:383-457 — defaults use_state+use_action,
    hid_sizes (32, 32).
    """

    use_state: bool = True
    use_action: bool = True
    use_next_state: bool = False
    use_done: bool = False
    hid_sizes: Sequence[int] = (32, 32)
    activation: Callable = nn.relu
    # normalize_input_layer=RunningNorm in the reference's tuned adversarial
    # configs (reference config/tuned_hps/*gail*/airl*.json net_kwargs);
    # stats update when the caller passes update_stats=True + mutable.
    normalize_input: bool = False

    @nn.compact
    def __call__(self, obs, acts, next_obs, dones, *, update_stats: bool = False):
        obs_p, acts_p, next_obs_p, dones_p = self.preprocess(obs, acts, next_obs, dones)
        inputs = []
        if self.use_state:
            inputs.append(obs_p)
        if self.use_action:
            inputs.append(acts_p)
        if self.use_next_state:
            inputs.append(next_obs_p)
        if self.use_done:
            inputs.append(dones_p[:, None])
        x = jnp.concatenate(inputs, axis=-1)
        if self.normalize_input:
            x = networks.RunningNorm(num_features=x.shape[-1], name="input_norm")(
                x, update_stats=update_stats
            )
        mlp = networks.MLP(
            hid_sizes=tuple(self.hid_sizes),
            out_size=1,
            activation=self.activation,
            squeeze_output=True,
            name="mlp",
        )
        return mlp(x)


class CnnRewardNet(RewardNet):
    """CNN reward net for image obs + discrete actions.

    Reference: reward_nets.py:460-610 — outputs a per-action reward vector
    from the state CNN and dots with the one-hot action (:540-583); when
    ``use_done``, output doubles to per-(action, done) and done selects the
    half (:585-597, the "done-doubling trick").
    """

    use_state: bool = True
    use_action: bool = True
    use_next_state: bool = False
    use_done: bool = False
    hid_channels: Sequence[int] = (32, 32)
    activation: Callable = nn.relu
    kernel_size: int = 3
    stride: int = 1

    def setup(self):
        if not (self.use_state or self.use_next_state):
            raise ValueError("CnnRewardNet must take current or next state as input.")
        if not self.action_space.is_discrete and self.use_action:
            raise ValueError("CnnRewardNet uses one-hot actions: action space must be discrete.")
        n_actions = self.action_space.n if self.use_action else 1
        out_size = n_actions * (2 if self.use_done else 1)
        self._out_size = out_size
        self.cnn = networks.CNN(
            hid_channels=tuple(self.hid_channels),
            out_size=out_size,
            activation=self.activation,
            kernel_size=self.kernel_size,
            stride=self.stride,
        )

    def __call__(self, obs, acts, next_obs, dones, *, update_stats: bool = False):
        x = obs if self.use_state else next_obs
        x = x.astype(jnp.float32)
        if np.issubdtype(np.dtype(self.observation_space.dtype), np.integer):
            x = x / 255.0
        outputs = self.cnn(x)  # [B, out_size]
        if self.use_action:
            one_hot = jax.nn.one_hot(acts.astype(jnp.int32), self.action_space.n)
        else:
            one_hot = jnp.ones((x.shape[0], 1))
        if self.use_done:
            n = self._out_size // 2
            not_done = outputs[:, :n]
            done_out = outputs[:, n:]
            d = dones.astype(jnp.float32)[:, None]
            per_action = not_done * (1 - d) + done_out * d
        else:
            per_action = outputs
        return jnp.sum(per_action * one_hot, axis=-1)


class BasicPotentialMLP(nn.Module):
    """State-only potential function phi(s) (reference reward_nets.py:812-839)."""

    observation_space: Space
    hid_sizes: Sequence[int] = (32, 32)

    @nn.compact
    def __call__(self, obs):
        x = preprocess_space(self.observation_space, obs)
        return networks.MLP(
            hid_sizes=tuple(self.hid_sizes), out_size=1, squeeze_output=True, name="mlp"
        )(x)


class BasicPotentialCNN(nn.Module):
    """CNN potential function (reference reward_nets.py:842-881)."""

    observation_space: Space
    hid_channels: Sequence[int] = (32, 32)

    @nn.compact
    def __call__(self, obs):
        x = obs.astype(jnp.float32)
        if np.issubdtype(np.dtype(self.observation_space.dtype), np.integer):
            x = x / 255.0
        return networks.CNN(
            hid_channels=tuple(self.hid_channels), out_size=1, squeeze_output=True,
            name="cnn",
        )(x)


class ShapedRewardNet(RewardNet):
    """Potential shaping: r'(s,a,s') = r(s,a,s') + gamma*phi(s')*(1-done) - phi(s).

    A ForwardWrapper — affects training gradients. The ``(1-done)`` factor
    zeroes the terminal new-state potential so shaping stays policy-invariant
    on episode ends (reference reward_nets.py:674-737, esp. :711-734).
    """

    base: RewardNet = None
    potential: nn.Module = None
    discount_factor: float = 0.99

    def __call__(self, obs, acts, next_obs, dones, *, update_stats: bool = False):
        base_out = self.base(obs, acts, next_obs, dones, update_stats=update_stats)
        new_pot = self.potential(next_obs)
        old_pot = self.potential(obs)
        d = dones.astype(jnp.float32)
        return base_out + self.discount_factor * (1.0 - d) * new_pot - old_pot

    def base_forward(self, obs, acts, next_obs, dones):
        """The unshaped base reward — AIRL's transferable ``reward_test``
        strips shaping (reference adversarial/airl.py:121-132)."""
        return self.base(obs, acts, next_obs, dones)


def BasicShapedRewardNet(
    observation_space: Space,
    action_space: Space,
    *,
    reward_hid_sizes: Sequence[int] = (32,),
    potential_hid_sizes: Sequence[int] = (32, 32),
    discount_factor: float = 0.99,
    **kwargs,
) -> ShapedRewardNet:
    """Reference reward_nets.py:739-809: MLP reward + MLP potential."""
    base = BasicRewardNet(
        observation_space=observation_space,
        action_space=action_space,
        hid_sizes=tuple(reward_hid_sizes),
        name="base",
        **kwargs,
    )
    potential = BasicPotentialMLP(
        observation_space=observation_space,
        hid_sizes=tuple(potential_hid_sizes),
        name="potential",
    )
    return ShapedRewardNet(
        observation_space=observation_space,
        action_space=action_space,
        base=base,
        potential=potential,
        discount_factor=discount_factor,
    )


class NormalizedRewardNet(RewardNet):
    """Output-normalizing PredictProcessedWrapper.

    Training forward returns the raw base reward; ``predict_processed``
    standardizes by running output statistics, optionally updating them
    (reference reward_nets.py:613-671). Stats live in the ``stats``
    collection — callers pass ``mutable=["stats"]`` + ``update_stats=True``
    to fold relabeling batches into the normalizer, matching the reference's
    ``update_stats=True`` default at relabel time.
    """

    base: RewardNet = None
    normalize_cls: Type[networks.NormLayer] = networks.RunningNorm

    def setup(self):
        self.normalizer = self.normalize_cls(num_features=1, name="normalizer")

    def __call__(self, obs, acts, next_obs, dones, *, update_stats: bool = False):
        return self.base(obs, acts, next_obs, dones)

    def predict_processed(self, obs, acts, next_obs, dones, update_stats: bool = True):
        rew = self.base(obs, acts, next_obs, dones)
        out = self.normalizer(rew[:, None], update_stats=update_stats)[:, 0]
        return out

    def _init_paths(self, obs, acts, next_obs, dones):
        # init must trace predict_processed too, else the normalizer's stats
        # variables would not exist in the initialized pytree.
        self(obs, acts, next_obs, dones)
        return self.predict_processed(obs, acts, next_obs, dones, update_stats=False)

    def init_variables(self, key: jax.Array, batch: int = 2):
        obs = jnp.zeros((batch,) + self.observation_space.shape, jnp.float32)
        if self.action_space.is_discrete:
            acts = jnp.zeros((batch,), jnp.int32)
        else:
            acts = jnp.zeros((batch,) + self.action_space.shape, jnp.float32)
        dones = jnp.zeros((batch,), jnp.float32)
        return self.init(key, obs, acts, obs, dones, method="_init_paths")


class RewardEnsemble(RewardNet):
    """Ensemble of reward nets with mean/variance predictions.

    Reference: reward_nets.py:884-1016 (RewardNetWithVariance API). Members
    are a single vmapped module — one batched forward evaluates all members
    on the MXU simultaneously instead of a Python loop over modules.
    """

    member_cls: Type[RewardNet] = None
    num_members: int = 3
    member_kwargs: dict = None
    # Per-member output normalization (reference reward_ensemble config:
    # ensemble_member_config.normalize_output_layer = RunningNorm,
    # ingredients/reward.py:54-66). Each member's predict_processed
    # standardizes with its OWN running stats; training still sees raw
    # member outputs.
    member_normalize_cls: Optional[Type] = None

    def setup(self):
        if self.num_members < 2:
            raise ValueError("Must be at least 2 member in the ensemble.")
        member_kwargs = dict(self.member_kwargs or {})
        base_cls = self.member_cls
        if self.member_normalize_cls is not None:
            inner = base_cls(
                observation_space=self.observation_space,
                action_space=self.action_space,
                **member_kwargs,
            )
            member_kwargs = {
                "base": inner,
                "normalize_cls": self.member_normalize_cls,
            }
            base_cls = NormalizedRewardNet
        VmapMember = nn.vmap(
            base_cls,
            in_axes=None,
            out_axes=0,
            axis_size=self.num_members,
            variable_axes={"params": 0, "stats": 0},
            split_rngs={"params": True},
            methods=["__call__", "predict_processed", "_init_paths"]
            if base_cls is NormalizedRewardNet
            else ["__call__", "predict_processed"],
        )
        self.members = VmapMember(
            observation_space=self.observation_space,
            action_space=self.action_space,
            name="members",
            **member_kwargs,
        )

    def predict_processed_all(self, obs, acts, next_obs, dones, *, update_stats: bool = False):
        """[num_members, B] per-member processed rewards (reference :924-947).

        ``update_stats`` is passed positionally — nn.vmap drops kwargs.
        """
        return self.members.predict_processed(obs, acts, next_obs, dones, update_stats)

    def predict_reward_moments(self, obs, acts, next_obs, dones, *, update_stats: bool = False):
        """(mean [B], var [B]) across members (reference :949-980, ddof=1)."""
        all_r = self.predict_processed_all(
            obs, acts, next_obs, dones, update_stats=update_stats
        )
        mean = all_r.mean(axis=0)
        var = all_r.var(axis=0, ddof=1)
        return mean, var

    def __call__(self, obs, acts, next_obs, dones, *, update_stats: bool = False):
        """[num_members, B] raw member outputs (training path)."""
        return self.members(obs, acts, next_obs, dones)

    def predict_processed(self, obs, acts, next_obs, dones, update_stats: bool = False):
        mean, _ = self.predict_reward_moments(
            obs, acts, next_obs, dones, update_stats=update_stats
        )
        return mean

    def _init_paths(self, obs, acts, next_obs, dones):
        # trace both member paths at init so normalized members' stats
        # variables exist (see NormalizedRewardNet._init_paths)
        if self.member_normalize_cls is not None:
            self.members._init_paths(obs, acts, next_obs, dones)
        else:
            self.members(obs, acts, next_obs, dones)
        return self.members.predict_processed(obs, acts, next_obs, dones, False)

    def init_variables(self, key: jax.Array, batch: int = 2):
        obs = jnp.zeros((batch,) + self.observation_space.shape, jnp.float32)
        if self.action_space.is_discrete:
            acts = jnp.zeros((batch,), jnp.int32)
        else:
            acts = jnp.zeros((batch,) + self.action_space.shape, jnp.float32)
        dones = jnp.zeros((batch,), jnp.float32)
        return self.init(key, obs, acts, obs, dones, method="_init_paths")


class AddSTDRewardWrapper(RewardNet):
    """r = mean + alpha*std over an ensemble — risk-sensitive RLHF reward
    (reference reward_nets.py:1019-1078)."""

    base: RewardEnsemble = None
    default_alpha: float = 0.0

    def __call__(self, obs, acts, next_obs, dones, *, update_stats: bool = False):
        return self.predict_processed(obs, acts, next_obs, dones)

    def predict_processed(
        self, obs, acts, next_obs, dones, update_stats: bool = False,
        alpha: Optional[float] = None,
    ):
        if alpha is None:
            alpha = self.default_alpha
        mean, var = self.base.predict_reward_moments(
            obs, acts, next_obs, dones, update_stats=update_stats
        )
        return mean + alpha * jnp.sqrt(var)

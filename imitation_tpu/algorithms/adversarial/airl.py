"""AIRL: Adversarial IRL (Fu et al. 2018).

Counterpart of reference ``algorithms/adversarial/airl.py``:

* discriminator logit = f_theta(s,a,s') - log pi(a|s)
  (reference airl.py:67-119) — requires a stochastic generator policy
  (airl.py:62-65);
* default reward net is ``BasicShapedRewardNet`` (set by reference
  scripts/ingredients/reward.py:73-76);
* ``reward_test`` strips the potential-shaping wrapper so the *unshaped*
  reward transfers to new dynamics (reference airl.py:121-132).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from imitation_tpu.algorithms.adversarial import common
from imitation_tpu.rewards.reward_nets import (
    BasicShapedRewardNet,
    RewardNet,
    ShapedRewardNet,
)
from imitation_tpu.rl import common as rl_common


class AIRL(common.AdversarialTrainer):
    """AIRL (reference airl.py:15-132)."""

    def __init__(self, *, reward_net: Optional[RewardNet] = None, venv=None, **kwargs):
        if reward_net is None:
            reward_net = BasicShapedRewardNet(
                venv.observation_space, venv.action_space
            )
        super().__init__(venv=venv, reward_net=reward_net, **kwargs)

    @property
    def needs_policy_log_prob(self) -> bool:
        return True

    def logits_expert_is_high(
        self, reward_variables, obs, acts, next_obs, dones, log_policy_act_prob=None
    ) -> jnp.ndarray:
        """Logit = f(s,a,s') - log pi(a|s) (reference airl.py:67-119)."""
        if log_policy_act_prob is None:
            raise TypeError(
                "Non-None `log_policy_act_prob` is required for this method.",
            )
        reward_output_train = self.reward_net.apply(
            reward_variables, obs, acts, next_obs, dones
        )
        return reward_output_train - log_policy_act_prob

    def reward_train_fn(self) -> rl_common.RelabelRewardFn:
        """Generator trains on the full shaped reward f (forward path)."""

        def fn(reward_variables, obs, acts, next_obs, dones):
            return self.reward_net.apply(
                reward_variables, obs, acts, next_obs, dones
            )

        return fn

    def reward_test_fn(self) -> rl_common.RelabelRewardFn:
        """Transfer reward: the shaping-stripped base net
        (reference airl.py:121-132)."""
        if isinstance(self.reward_net, ShapedRewardNet):

            def fn(reward_variables, obs, acts, next_obs, dones):
                return self.reward_net.apply(
                    reward_variables, obs, acts, next_obs, dones,
                    method="base_forward",
                )

            return fn
        return self.reward_train_fn()

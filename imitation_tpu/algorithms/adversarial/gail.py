"""GAIL: Generative Adversarial Imitation Learning (Ho & Ermon 2016).

Counterpart of reference ``algorithms/adversarial/gail.py``:

* discriminator logits = raw reward-net output (reference gail.py:135-160);
* generator reward = -log sigmoid(-logits) = softplus(logits), the
  ``RewardNetFromDiscriminatorLogit`` transform (reference gail.py:14-83);
* reward_train == reward_test == processed net (reference gail.py:162-168).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from imitation_tpu.algorithms.adversarial import common
from imitation_tpu.rewards.reward_nets import BasicRewardNet, RewardNet
from imitation_tpu.rl import common as rl_common


class GAIL(common.AdversarialTrainer):
    """GAIL (reference gail.py:86-168)."""

    def __init__(self, *, reward_net: Optional[RewardNet] = None, venv=None, **kwargs):
        if reward_net is None:
            reward_net = BasicRewardNet(
                observation_space=venv.observation_space,
                action_space=venv.action_space,
            )
        super().__init__(venv=venv, reward_net=reward_net, **kwargs)

    def logits_expert_is_high(
        self, reward_variables, obs, acts, next_obs, dones, log_policy_act_prob=None
    ) -> jnp.ndarray:
        """Logit = reward net raw forward (reference gail.py:135-160)."""
        return self.reward_net.apply(reward_variables, obs, acts, next_obs, dones)

    def reward_train_fn(self) -> rl_common.RelabelRewardFn:
        """Generator reward: softplus(logits) = -log sigmoid(-logits)."""

        def fn(reward_variables, obs, acts, next_obs, dones):
            logits = self.reward_net.apply(
                reward_variables, obs, acts, next_obs, dones,
                method="predict_processed",
            )
            return jax.nn.softplus(logits)

        return fn

"""Testing reward nets (counterpart of reference testing/reward_nets.py)."""

from __future__ import annotations

import jax.numpy as jnp

from imitation_tpu.envs.base import Space
from imitation_tpu.rewards.reward_nets import RewardEnsemble, RewardNet


class MockRewardNet(RewardNet):
    """Constant-output reward net (reference testing/reward_nets.py:26-57)."""

    value: float = 0.0

    def __call__(self, obs, acts, next_obs, dones, *, update_stats: bool = False):
        batch = obs.shape[0] if hasattr(obs, "shape") else len(obs)
        return jnp.full((batch,), self.value, jnp.float32)


def make_ensemble(
    observation_space: Space,
    action_space: Space,
    num_members: int = 2,
    **kwargs,
) -> RewardEnsemble:
    """Builds a small BasicRewardNet ensemble (reference :10-23)."""
    from imitation_tpu.rewards.reward_nets import BasicRewardNet

    return RewardEnsemble(
        observation_space=observation_space,
        action_space=action_space,
        member_cls=BasicRewardNet,
        num_members=num_members,
        member_kwargs=kwargs or None,
    )

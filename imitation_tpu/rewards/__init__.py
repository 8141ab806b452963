"""Reward networks, wrappers and serialization."""

from imitation_tpu.rewards.reward_function import RewardFn  # noqa: F401

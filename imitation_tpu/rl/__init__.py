"""RL inner loops replacing Stable Baselines 3: PPO, SAC, DQN."""

from imitation_tpu.rl.common import RLState  # noqa: F401
from imitation_tpu.rl.dqn import DQN, DQNConfig  # noqa: F401
from imitation_tpu.rl.ppo import PPO, PPOConfig  # noqa: F401
from imitation_tpu.rl.sac import SAC, SACConfig  # noqa: F401

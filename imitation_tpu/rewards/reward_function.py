"""The RewardFn protocol.

Counterpart of reference ``rewards/reward_function.py`` (35 LoC): a reward
function is a callable ``(state, action, next_state, done) -> rewards`` over
batched arrays. Host-facing code uses numpy; device-facing relabeling uses
the jit-side ``RelabelRewardFn`` signature from ``rl/common.py`` (which adds
an explicit ``reward_params`` pytree so the function stays pure).
"""

from __future__ import annotations

from typing import Protocol

import numpy as np


class RewardFn(Protocol):
    """Abstract class for reward function (reference reward_function.py:9-35)."""

    def __call__(
        self,
        state: np.ndarray,
        action: np.ndarray,
        next_state: np.ndarray,
        done: np.ndarray,
    ) -> np.ndarray:
        ...

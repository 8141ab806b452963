"""Data layer: trajectory/transition types, rollout engine, replay buffers."""

from imitation_tpu.data.types import (  # noqa: F401
    DictObs,
    Trajectory,
    TrajectoryBatch,
    TrajectoryWithRew,
    TransitionBatch,
    Transitions,
    TransitionsMinimal,
    TransitionsWithRew,
)

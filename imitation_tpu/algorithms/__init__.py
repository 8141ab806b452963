"""The eight algorithm families (reference algorithms/ package)."""

from imitation_tpu.algorithms.base import (  # noqa: F401
    BaseImitationAlgorithm,
    DemonstrationAlgorithm,
    DemonstrationStore,
)

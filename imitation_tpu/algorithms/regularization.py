"""Generic regularization with adaptive coefficient scaling.

Counterpart of reference ``algorithms/regularization/`` (regularizers.py 306
LoC + updaters.py 133 LoC):

* ``Regularizer`` ABC with a ``create(...)`` factory (reference
  regularizers.py:59-193) carrying a coefficient ``lambda_`` and an optional
  ``LambdaUpdater``.
* ``LpRegularizer`` — adds lambda * ||theta||_p^p to the loss
  (reference :253-290).
* ``WeightDecayRegularizer`` — direct weight shrinkage (reference :293-306).
* ``IntervalParamScaler`` — scales lambda up/down when the val/train loss
  ratio leaves a tolerable interval (reference updaters.py:28-133).

In the functional JAX trainers the regularizer contributes a scalar penalty
term inside the jitted loss (via ``loss_penalty``), and ``update_params``
adjusts ``lambda_`` on host between epochs.
"""

from __future__ import annotations

import abc
from typing import Any, Callable, Optional, Protocol

import jax
import jax.numpy as jnp

from imitation_tpu.util.logger import HierarchicalLogger, configure


class LambdaUpdater(Protocol):
    """Protocol mapping (lambda, train_loss, val_loss) -> new lambda
    (reference updaters.py:11-25)."""

    def __call__(self, lambda_: float, train_loss: float, val_loss: float) -> float:
        ...


class ConstantParamScaler:
    def __call__(self, lambda_: float, train_loss: float, val_loss: float) -> float:
        return lambda_


class IntervalParamScaler:
    """Scales lambda by a factor when val/train loss ratio leaves
    [tolerable_interval] (reference updaters.py:28-133)."""

    def __init__(self, scaling_factor: float, tolerable_interval: tuple):
        eps = 10 ** (-6)
        if not (eps < scaling_factor < 1 - eps):
            raise ValueError(
                "scaling_factor must be in (0, 1) within numerical precision.",
            )
        if len(tolerable_interval) != 2:
            raise ValueError("tolerable_interval must be a tuple of length 2.")
        if not (tolerable_interval[0] >= 0 and tolerable_interval[0] < tolerable_interval[1]):
            raise ValueError(
                "tolerable_interval must be a tuple whose first element "
                "is non-negative and is smaller than the second element.",
            )
        self.scaling_factor = scaling_factor
        self.tolerable_interval = tolerable_interval

    def __call__(self, lambda_: float, train_loss: float, val_loss: float) -> float:
        if val_loss is None or train_loss is None:
            raise ValueError("train_loss and val_loss must not be None")
        if lambda_ <= 0:
            raise ValueError("lambda_ must be strictly positive")
        if train_loss < 0 or val_loss < 0:
            raise ValueError("losses must be non-negative")
        eps = 10 ** (-6)
        if train_loss < eps:
            # avoid division by zero: treat as ratio above interval if val
            # loss is also large, else keep lambda.
            if val_loss < eps:
                return lambda_
            return lambda_ / self.scaling_factor
        val_to_train = val_loss / train_loss
        if val_to_train > self.tolerable_interval[1]:
            return lambda_ / self.scaling_factor
        if val_to_train < self.tolerable_interval[0]:
            return lambda_ * self.scaling_factor
        return lambda_


class Regularizer(abc.ABC):
    """Regularizer with adaptive coefficient (reference regularizers.py:59-193)."""

    def __init__(
        self,
        initial_lambda: float,
        lambda_updater: Optional[LambdaUpdater] = None,
        val_split: Optional[float] = None,
        logger: Optional[HierarchicalLogger] = None,
        optimizer: Any = None,
    ):
        if lambda_updater is None and val_split is not None:
            raise ValueError(
                "If lambda_updater is None, val_split should be None too.",
            )
        if lambda_updater is not None and val_split is None:
            raise ValueError(
                "If lambda_updater is provided, val_split must be provided too.",
            )
        if val_split is not None and (val_split <= 0 or val_split >= 1):
            raise ValueError(f"val_split = {val_split} must be in (0, 1)")
        if lambda_updater is None and initial_lambda == 0:
            raise ValueError(
                "If lambda_updater is None, initial_lambda must be non-zero.",
            )
        self.lambda_ = initial_lambda
        self.lambda_updater = lambda_updater
        self.val_split = val_split
        self.logger = logger or configure()
        self.logger.record("regularization_lambda", self.lambda_)

    @classmethod
    def create(cls, **kwargs) -> Callable[..., "Regularizer"]:
        """Factory partial (reference RegularizerFactory pattern :135-193)."""

        def factory(*, optimizer=None, logger=None):
            return cls(optimizer=optimizer, logger=logger, **kwargs)

        return factory

    @abc.abstractmethod
    def loss_penalty(self, params: Any) -> jnp.ndarray:
        """Scalar penalty added to the loss (unscaled by lambda)."""

    def update_params(self, train_loss: float, val_loss: float) -> None:
        if self.lambda_updater is not None:
            self.lambda_ = self.lambda_updater(self.lambda_, train_loss, val_loss)
            self.logger.record("regularization_lambda", self.lambda_)


class LpRegularizer(Regularizer):
    """lambda * sum |theta|^p (reference :253-290)."""

    def __init__(self, *args, p: int = 2, **kwargs):
        super().__init__(*args, **kwargs)
        if not isinstance(p, int) or p < 1:
            raise ValueError("p must be a positive integer")
        self.p = p

    def loss_penalty(self, params: Any) -> jnp.ndarray:
        return sum(
            jnp.sum(jnp.abs(leaf) ** self.p) for leaf in jax.tree.leaves(params)
        )


class WeightDecayRegularizer(Regularizer):
    """Direct weight shrinkage by lambda * lr per step (reference :293-306).

    In the functional trainers this is expressed as an L2 penalty whose
    gradient equals the decay term.
    """

    def loss_penalty(self, params: Any) -> jnp.ndarray:
        return 0.5 * sum(
            jnp.sum(jnp.square(leaf)) for leaf in jax.tree.leaves(params)
        )

"""Network building blocks: MLP/CNN builders and running normalization.

Flax-linen counterparts of the reference's ``util/networks.py``:

* ``MLP`` / ``build_mlp`` — reference ``build_mlp`` (util/networks.py:204-283):
  hidden sizes, optional input flattening, optional input normalization
  layer, dropout, squeezed scalar output.
* ``CNN`` / ``build_cnn`` — reference ``build_cnn`` (util/networks.py:286-357):
  conv stack with adaptive-average-pool head.
* ``RunningNorm`` — Chan-et-al numerically stable streaming moments
  (util/networks.py:98-134), kept in a mutable ``stats`` collection so
  updates happen inside jit via ``mutable=["stats"]``.
* ``EMANorm`` — bias-corrected exponential moving average of moments
  (util/networks.py:137-201).

Dtype policy: parameters live in float32; ``compute_dtype`` lets callers run
matmuls in bfloat16 on the MXU while keeping normalizer statistics in f32.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Optional, Sequence, Tuple, Type

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class NormLayer(nn.Module):
    """Base for input normalization layers with streaming statistics.

    Stats live in the "stats" variable collection. Passing
    ``update_stats=True`` (and ``mutable=["stats"]``) folds the current batch
    into the statistics before normalizing — matching the train-time behavior
    of the reference's BaseNorm.forward (util/networks.py:66-96).
    """

    num_features: int
    eps: float = 1e-5

    def _init_stats(self):
        running_mean = self.variable(
            "stats", "running_mean", lambda: jnp.zeros((self.num_features,), jnp.float32)
        )
        running_var = self.variable(
            "stats", "running_var", lambda: jnp.ones((self.num_features,), jnp.float32)
        )
        count = self.variable("stats", "count", lambda: jnp.zeros((), jnp.int32))
        return running_mean, running_var, count

    def _update(self, mean_v, var_v, count_v, x: jnp.ndarray) -> None:
        raise NotImplementedError

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_stats: bool = False) -> jnp.ndarray:
        mean_v, var_v, count_v = self._init_stats()
        if update_stats:
            self._update(mean_v, var_v, count_v, x.astype(jnp.float32))
        normed = (x - mean_v.value) * jax.lax.rsqrt(var_v.value + self.eps)
        return normed.astype(x.dtype)


class RunningNorm(NormLayer):
    """Streaming mean/var via Chan et al. parallel update.

    Reference: src/imitation/util/networks.py:98-134.
    """

    def _update(self, mean_v, var_v, count_v, x: jnp.ndarray) -> None:
        b = x.reshape(-1, self.num_features)
        b_count = b.shape[0]
        b_mean = jnp.mean(b, axis=0)
        b_var = jnp.var(b, axis=0)
        count = count_v.value
        total = count + b_count
        delta = b_mean - mean_v.value
        new_mean = mean_v.value + delta * (b_count / jnp.maximum(total, 1))
        m_a = var_v.value * count
        m_b = b_var * b_count
        m2 = m_a + m_b + delta**2 * count * b_count / jnp.maximum(total, 1)
        new_var = m2 / jnp.maximum(total, 1)
        # First batch: adopt batch stats outright (count==0 => running_var init 1
        # must not pollute).
        is_first = count == 0
        mean_v.value = jnp.where(is_first, b_mean, new_mean)
        var_v.value = jnp.where(is_first, b_var, new_var)
        count_v.value = total


class EMANorm(NormLayer):
    """Bias-corrected EMA of mean/var (reference util/networks.py:137-201)."""

    decay: float = 0.99

    def _init_stats(self):
        mean_v, var_v, count_v = super()._init_stats()
        # raw (uncorrected) accumulators
        self.variable("stats", "raw_mean", lambda: jnp.zeros((self.num_features,), jnp.float32))
        self.variable("stats", "raw_sq", lambda: jnp.zeros((self.num_features,), jnp.float32))
        return mean_v, var_v, count_v

    def _update(self, mean_v, var_v, count_v, x: jnp.ndarray) -> None:
        raw_mean = self.get_variable("stats", "raw_mean")
        raw_sq = self.get_variable("stats", "raw_sq")
        b = x.reshape(-1, self.num_features)
        b_mean = jnp.mean(b, axis=0)
        b_sq = jnp.mean(b**2, axis=0)
        d = self.decay
        new_raw_mean = d * raw_mean + (1 - d) * b_mean
        new_raw_sq = d * raw_sq + (1 - d) * b_sq
        count = count_v.value + 1
        correction = 1.0 - d ** count.astype(jnp.float32)
        corr_mean = new_raw_mean / correction
        corr_sq = new_raw_sq / correction
        self.put_variable("stats", "raw_mean", new_raw_mean)
        self.put_variable("stats", "raw_sq", new_raw_sq)
        mean_v.value = corr_mean
        var_v.value = jnp.maximum(corr_sq - corr_mean**2, 0.0)
        count_v.value = count


class MLP(nn.Module):
    """MLP with the reference ``build_mlp`` feature set."""

    hid_sizes: Sequence[int]
    out_size: int = 1
    activation: Callable = nn.relu
    dropout_prob: float = 0.0
    squeeze_output: bool = False
    flatten_input: bool = False
    normalize_input_layer: Optional[Type[NormLayer]] = None
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        *,
        train: bool = False,
        update_stats: bool = False,
    ) -> jnp.ndarray:
        if self.flatten_input or x.ndim > 2:
            x = x.reshape((x.shape[0], -1))
        if self.normalize_input_layer is not None:
            x = self.normalize_input_layer(num_features=x.shape[-1], name="input_norm")(
                x, update_stats=update_stats
            )
        x = x.astype(self.compute_dtype)
        for i, h in enumerate(self.hid_sizes):
            x = nn.Dense(h, dtype=self.compute_dtype, name=f"dense{i}")(x)
            x = self.activation(x)
            if self.dropout_prob > 0:
                x = nn.Dropout(rate=self.dropout_prob, deterministic=not train)(x)
        x = nn.Dense(self.out_size, dtype=self.compute_dtype, name="dense_out")(x)
        x = x.astype(jnp.float32)
        if self.squeeze_output:
            if self.out_size != 1:
                raise ValueError("squeeze_output is only valid with out_size=1")
            x = x.squeeze(-1)
        return x


def build_mlp(
    hid_sizes: Iterable[int],
    out_size: int = 1,
    **kwargs,
) -> MLP:
    """Constructs an MLP module (reference util/networks.py:204-283)."""
    return MLP(hid_sizes=tuple(hid_sizes), out_size=out_size, **kwargs)


class CNN(nn.Module):
    """Conv stack + global average pool + dense head.

    Reference: build_cnn (util/networks.py:286-357) — hidden conv channels,
    AdaptiveAvgPool2d(1) head, dense output. Input layout NHWC.
    """

    hid_channels: Sequence[int]
    out_size: int = 1
    activation: Callable = nn.relu
    kernel_size: int = 3
    stride: int = 1
    padding: str = "SAME"
    dropout_prob: float = 0.0
    squeeze_output: bool = False
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, *, train: bool = False, update_stats: bool = False
    ) -> jnp.ndarray:
        if x.ndim == 3:
            x = x[..., None]
        x = x.astype(self.compute_dtype)
        for i, ch in enumerate(self.hid_channels):
            x = nn.Conv(
                ch,
                (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding=self.padding,
                dtype=self.compute_dtype,
                name=f"conv{i}",
            )(x)
            x = self.activation(x)
            if self.dropout_prob > 0:
                x = nn.Dropout(rate=self.dropout_prob, deterministic=not train)(x)
        x = jnp.mean(x, axis=(1, 2))  # adaptive average pool to 1x1
        x = nn.Dense(self.out_size, dtype=self.compute_dtype, name="dense_out")(x)
        x = x.astype(jnp.float32)
        if self.squeeze_output:
            if self.out_size != 1:
                raise ValueError("squeeze_output is only valid with out_size=1")
            x = x.squeeze(-1)
        return x


def build_cnn(hid_channels: Iterable[int], out_size: int = 1, **kwargs) -> CNN:
    return CNN(hid_channels=tuple(hid_channels), out_size=out_size, **kwargs)

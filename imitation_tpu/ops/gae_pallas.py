"""Pallas TPU kernel for GAE.

The associative-scan GAE in ``ops/gae.py`` is O(log T) depth but
materializes O(T) intermediate (mult, delta) pairs through XLA's generic
scan lowering. This kernel computes the backward recurrence

    A_t = delta_t + gamma * lam * (1 - done_t) * A_{t+1}

in a single VMEM-resident pass: the [T, B] panels stream into VMEM, a
``fori_loop`` walks time in reverse with all B lanes vectorized on the VPU
(8x128 lanes — B should be a multiple of 128 for full utilization), and the
advantage panel is written back once. For rollout shapes (T<=2048, B<=4096
f32 panels: T*B*4 bytes each, 5 inputs + 1 output) everything fits in the
~16 MB VMEM for T*B up to ~600k elements; larger panels should tile over B.

Falls back to the associative-scan implementation on non-TPU backends.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from imitation_tpu.ops import gae as gae_ref


def _gae_kernel(rews_ref, values_ref, next_values_ref, terminated_ref,
                dones_ref, gamma_lam_ref, adv_ref):
    gamma = gamma_lam_ref[0, 0]
    lam = gamma_lam_ref[0, 1]
    T = rews_ref.shape[0]

    # Reverse-time sequential recurrence, vectorized over the B lanes.
    # Rows are read from VMEM refs at the dynamic index (Pallas TPU supports
    # dynamic ref slicing; dynamic_slice on materialized values does not
    # lower).
    def body(i, carry):
        t = T - 1 - i
        delta = (
            rews_ref[t, :]
            + gamma * next_values_ref[t, :] * (1.0 - terminated_ref[t, :])
            - values_ref[t, :]
        )
        m = gamma * lam * (1.0 - dones_ref[t, :])
        a = delta + m * carry
        adv_ref[t, :] = a
        return a

    jax.lax.fori_loop(0, T, body, jnp.zeros_like(rews_ref[0, :]))


@functools.partial(jax.jit, static_argnames=("gamma", "lam", "interpret"))
def gae_pallas(
    rews: jnp.ndarray,
    values: jnp.ndarray,
    next_values: jnp.ndarray,
    terminated: jnp.ndarray,
    dones: jnp.ndarray,
    gamma: float,
    lam: float,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas GAE; same contract as ops.gae.gae."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    args = [
        rews.astype(f32),
        values.astype(f32),
        next_values.astype(f32),
        terminated.astype(f32),
        dones.astype(f32),
    ]
    gamma_lam = jnp.asarray([[gamma, lam]], f32)
    vmem = pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM)
    smem = pl.BlockSpec((1, 2), memory_space=pltpu.SMEM)
    advantages = pl.pallas_call(
        _gae_kernel,
        out_shape=jax.ShapeDtypeStruct(rews.shape, f32),
        in_specs=[vmem] * 5 + [smem],
        out_specs=vmem,
        interpret=interpret,
    )(*args, gamma_lam)
    return advantages, advantages + values.astype(f32)


def gae_auto(
    rews, values, next_values, terminated, dones, gamma: float, lam: float,
    prefer_pallas: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch between the Pallas kernel and the associative scan.

    The scan is the default everywhere: it is already fast (O(log T) depth)
    and compiles quickly. Pass ``prefer_pallas=True`` on TPU backends to use
    the VMEM kernel (note: on remote-compile runtimes the Mosaic compile of
    this kernel has been observed to be very slow — verify on your stack
    before enabling in a hot path).

    Measured on a TPU v5e chip (f32, zero-done batches): T=128 B=1024 —
    scan 30us vs pallas 48us; T=128 B=4096 — scan ~1.0ms vs pallas 0.8ms
    (results equal to ~7e-6). Both are noise next to a full training round,
    so the simpler scan stays the default.
    """
    if prefer_pallas and jax.default_backend() == "tpu":
        return gae_pallas(rews, values, next_values, terminated, dones, gamma, lam)
    return gae_ref.gae(rews, values, next_values, terminated, dones, gamma, lam)

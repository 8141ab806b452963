"""Pallas TPU kernel: fused expert+generator discriminator-batch assembly.

The adversarial discriminator batch is ``[expert rows; generator rows]``
(reference common.py:521-632 builds it with two gathers and a concat, three
HBM round trips per field). This kernel writes the assembled ``[2B, F]``
matrix directly: a scalar-prefetched grid walks output rows, and each step
DMAs exactly one source row — demo storage for the first B rows, replay
storage for the rest — into its output slot. One HBM output, no
intermediate expert/gen matrices.

Row indices are scalar-prefetched (``PrefetchScalarGridSpec``) so the DMA
source address of every grid step is known before the kernel body runs —
the TPU pattern for data-dependent gathers.

Falls back to gather+concat XLA ops on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(e_idx_ref, g_idx_ref, demo_ref, gen_ref, out_ref, *, B: int):
    del e_idx_ref, g_idx_ref  # consumed by the index maps
    i = pl.program_id(0)
    out_ref[0, :] = jnp.where(i < B, demo_ref[0, :], gen_ref[0, :])


@functools.partial(jax.jit, static_argnames=("interpret",))
def assemble_rows_pallas(
    demo: jnp.ndarray,
    gen: jnp.ndarray,
    e_idx: jnp.ndarray,
    g_idx: jnp.ndarray,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """``concat([demo[e_idx], gen[g_idx]])`` as one fused Pallas kernel.

    demo: [N, F] float32, gen: [C, F] float32, e_idx/g_idx: [B] int32.
    Returns [2B, F].
    """
    B = e_idx.shape[0]
    F = demo.shape[1]
    grid = (2 * B,)

    def demo_map(i, e_idx, g_idx):
        # For generator rows the loaded demo row is unused; clamp in-range.
        return (e_idx[jnp.minimum(i, B - 1)], 0)

    def gen_map(i, e_idx, g_idx):
        return (g_idx[jnp.maximum(i - B, 0)], 0)

    return pl.pallas_call(
        functools.partial(_kernel, B=B),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, F), demo_map),
                pl.BlockSpec((1, F), gen_map),
            ],
            out_specs=pl.BlockSpec((1, F), lambda i, e, g: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((2 * B, F), demo.dtype),
        interpret=interpret,
    )(e_idx, g_idx, demo, gen)


def assemble_rows(
    demo: jnp.ndarray,
    gen: jnp.ndarray,
    e_idx: jnp.ndarray,
    g_idx: jnp.ndarray,
) -> jnp.ndarray:
    """Fused assembly on TPU; gather+concat elsewhere.

    Accepts [N] (scalar-feature) and [N, F] inputs; non-float or >2D inputs
    always take the XLA path.
    """
    if (
        jax.default_backend() == "tpu"
        and demo.ndim == 2
        and jnp.issubdtype(demo.dtype, jnp.floating)
    ):
        return assemble_rows_pallas(demo, gen, e_idx, g_idx)
    return jnp.concatenate([demo[e_idx], gen[g_idx]])

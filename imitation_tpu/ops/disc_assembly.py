"""Pallas TPU kernel: fused expert+generator discriminator-batch assembly.

The adversarial discriminator batch is ``[expert rows; generator rows]``
(reference common.py:521-632 builds it with two gathers and a concat, three
HBM round trips per field). This kernel writes the assembled ``[2B, F]``
matrix directly: row indices are scalar-prefetched into SMEM, and a single
kernel step walks the output rows issuing one row-DMA per output row —
demo storage for the first B rows, replay storage for the rest — with a
small semaphore ring keeping several copies in flight. Sources and
destination stay in HBM (``memory_space=ANY``); no intermediate
expert/gen matrices are materialized.

Scalar prefetch makes every DMA source address known before the body runs —
the TPU pattern for data-dependent gathers (Pallas guide:
PrefetchScalarGridSpec). Row blocks of shape ``[1, F]`` as pipeline
BlockSpecs would violate the float32 (8, 128) tile floor, which is why the
copies are explicit DMAs instead of a blocked grid.

Falls back to gather+concat XLA ops on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# DMA slots in flight; each slot's previous copy is awaited before reuse.
_N_SLOTS = 8


def _kernel(e_idx_ref, g_idx_ref, demo_ref, gen_ref, out_ref, sem, *, B: int):
    total = 2 * B

    def dma(i):
        """The row-i copy, reconstructable so start/wait agree."""
        slot = lax.rem(i, _N_SLOTS)

        def demo_dma():
            return pltpu.make_async_copy(
                demo_ref.at[e_idx_ref[jnp.minimum(i, B - 1)]],
                out_ref.at[i],
                sem.at[slot],
            )

        def gen_dma():
            return pltpu.make_async_copy(
                gen_ref.at[g_idx_ref[jnp.maximum(i - B, 0)]],
                out_ref.at[i],
                sem.at[slot],
            )

        return demo_dma, gen_dma

    def start(i):
        demo_dma, gen_dma = dma(i)

        @pl.when(i < B)
        def _():
            demo_dma().start()

        @pl.when(i >= B)
        def _():
            gen_dma().start()

    def wait(i):
        demo_dma, gen_dma = dma(i)

        @pl.when(i < B)
        def _():
            demo_dma().wait()

        @pl.when(i >= B)
        def _():
            gen_dma().wait()

    def body(i, _):
        # free this slot before reuse, then issue
        @pl.when(i >= _N_SLOTS)
        def _():
            wait(i - _N_SLOTS)

        start(i)
        return _

    lax.fori_loop(0, total, body, None)
    # drain the last ring of in-flight copies
    for k in range(_N_SLOTS):
        i = total - _N_SLOTS + k

        @pl.when(i >= 0)
        def _():
            wait(i)


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

    return pl.pallas_call(
        functools.partial(_kernel, B=B),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((_N_SLOTS,))],
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
    # MEASURED NEGATIVE RESULT (benchmarking/bench_kernels.py, real v5e):
    # XLA gather+concat 820us vs per-row-DMA kernel 985us at [2048, 128];
    # at F=256 the HBM memref tiling (8,128) rejects 1-row slices outright.
    # Scattered sub-KB row copies are below DMA granularity — XLA's
    # vectorized gather is the right tool at every practical shape, so it
    # is ALWAYS the default; the kernel above remains as the documented
    # exploration (correct in interpret mode and compilable at F=128).
    return jnp.concatenate([demo[e_idx], gen[g_idx]])

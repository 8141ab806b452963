"""Correctness of the fused disc-batch assembly kernel (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from imitation_tpu.ops.disc_assembly import assemble_rows, assemble_rows_pallas


def test_assemble_rows_pallas_matches_gather_concat():
    rng = np.random.default_rng(0)
    N, C, B, F = 64, 48, 16, 8
    demo = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    gen = jnp.asarray(rng.normal(size=(C, F)).astype(np.float32))
    e_idx = jnp.asarray(rng.integers(0, N, B).astype(np.int32))
    g_idx = jnp.asarray(rng.integers(0, C, B).astype(np.int32))
    expected = jnp.concatenate([demo[e_idx], gen[g_idx]])
    out = assemble_rows_pallas(demo, gen, e_idx, g_idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(expected))


def test_assemble_rows_fallback_on_cpu():
    demo = jnp.arange(12.0).reshape(6, 2)
    gen = demo + 100
    e_idx = jnp.asarray([0, 5], jnp.int32)
    g_idx = jnp.asarray([1, 2], jnp.int32)
    out = assemble_rows(demo, gen, e_idx, g_idx)
    np.testing.assert_array_equal(
        np.asarray(out),
        np.asarray(jnp.concatenate([demo[e_idx], gen[g_idx]])),
    )

"""Kernel micro-benchmarks at the shapes bench.py actually runs.

Measures, on the real chip:
  * GAE: associative-scan (ops/gae.py) vs Pallas VMEM kernel (ops/gae_pallas)
    at T=128 and bench batch sizes.
  * Disc-batch assembly: XLA gather+concat vs the fused Pallas kernel
    (ops/disc_assembly) at bench demo-batch sizes.

Prints one JSON line per measurement. Run ALONE on the chip.
"""

from __future__ import annotations

import json
import time


def force(out):
    """Fetch-based barrier: block_until_ready can return early on the
    some remote/tunneled TPU platforms; a device->host value fetch cannot."""
    import jax
    import jax.numpy as jnp

    return float(sum(jnp.sum(x) for x in jax.tree.leaves(out)))


def timeit(fn, *args, iters: int = 50) -> float:
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imitation_tpu.ops import gae as gae_ref
    from imitation_tpu.ops.gae_pallas import gae_pallas
    from imitation_tpu.ops.disc_assembly import assemble_rows_pallas

    rng = np.random.default_rng(0)
    T = 128
    for B in (1024, 4096):
        rews, vals, nvals = (
            jnp.asarray(rng.normal(size=(T, B)).astype(np.float32)) for _ in range(3)
        )
        term = jnp.zeros((T, B), jnp.float32)
        done = jnp.zeros((T, B), jnp.float32)
        scan_fn = jax.jit(lambda r, v, n, t, d: gae_ref.gae(r, v, n, t, d, 0.99, 0.95))
        t_scan = timeit(scan_fn, rews, vals, nvals, term, done)
        t_pallas = timeit(
            lambda r, v, n, t, d: gae_pallas(r, v, n, t, d, gamma=0.99, lam=0.95),
            rews, vals, nvals, term, done,
        )
        print(json.dumps({
            "kernel": "gae", "T": T, "B": B,
            "assoc_scan_us": round(t_scan * 1e6, 1),
            "pallas_us": round(t_pallas * 1e6, 1),
        }), flush=True)

    for B, F in ((2048, 128), (2048, 256), (8192, 128)):
        N, C = 16384, 16384
        demo = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
        gen = jnp.asarray(rng.normal(size=(C, F)).astype(np.float32))
        e_idx = jnp.asarray(rng.integers(0, N, B).astype(np.int32))
        g_idx = jnp.asarray(rng.integers(0, C, B).astype(np.int32))
        xla_fn = jax.jit(lambda d, g, e, gi: jnp.concatenate([d[e], g[gi]]))
        t_xla = timeit(xla_fn, demo, gen, e_idx, g_idx)
        t_pl = timeit(assemble_rows_pallas, demo, gen, e_idx, g_idx)
        print(json.dumps({
            "kernel": "disc_assembly", "B": B, "F": F,
            "xla_gather_concat_us": round(t_xla * 1e6, 1),
            "pallas_us": round(t_pl * 1e6, 1),
        }), flush=True)


if __name__ == "__main__":
    main()

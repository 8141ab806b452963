"""Worker for the simulated multi-process test (see test_distributed.py).

Launched as: python -m tests.parallel._distributed_worker <out_dir>
with JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID set.
Each process owns 4 virtual CPU devices; together they form an 8-device
('dp','tp') hybrid mesh. Runs one psum'd SGD step on a dp-sharded batch
(each process contributes a DIFFERENT local half) and writes the resulting
replicated params + global batch mean for the parent to verify.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

# The env's TPU plugin overrides JAX_PLATFORMS; force CPU post-import the
# way tests/conftest.py does.
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from imitation_tpu.parallel import distributed  # noqa: E402


def main(out_dir: str) -> None:
    distributed.initialize()
    pid = jax.process_index()
    assert jax.process_count() == 2
    assert jax.device_count() == 8
    assert jax.local_device_count() == 4

    mesh = distributed.make_global_mesh(tp=1)
    assert mesh.shape == {"dp": 8, "tp": 1}

    # Each process contributes a different local half of the global batch.
    local = np.arange(16, dtype=np.float32).reshape(4, 4) + 100.0 * pid
    gx = distributed.host_local_to_global(local, mesh, P("dp"))
    assert gx.shape == (8, 4)

    params = distributed.replicate_global(
        {"w": np.ones((4,), np.float32)}, mesh
    )

    @jax.jit
    def step(p, x):
        # loss = mean((x @ w)^2) over the GLOBAL batch; grad psums over dp.
        def loss_fn(p):
            y = x @ p["w"]
            return jnp.mean(y * y)

        g = jax.grad(loss_fn)(p)
        new = jax.tree.map(lambda a, b: a - 0.01 * b, p, g)
        return new, jnp.mean(x)

    out_sh = NamedSharding(mesh, P())
    step = jax.jit(step.__wrapped__, out_shardings=(out_sh, out_sh))
    new_params, batch_mean = step(params, gx)

    got_w = np.asarray(jax.device_get(new_params["w"]))
    got_mean = float(jax.device_get(batch_mean))

    # All-gather the dp-sharded input back to every host.
    full = distributed.process_allgather(gx)
    assert full.shape == (8, 4)

    distributed.barrier("done")
    np.savez(
        os.path.join(out_dir, f"result_{pid}.npz"),
        w=got_w,
        batch_mean=got_mean,
        full=full,
    )


if __name__ == "__main__":
    main(sys.argv[1])

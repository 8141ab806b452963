"""run_parity on the host CPU backend.

Some TPU plugins ignore ``JAX_PLATFORMS=cpu``; force the backend via
jax.config before anything initializes XLA. Lets cheap cells (BC seeds) run
concurrently with chip-bound queue items — training math is identical,
just slower. Usage: same CLI as benchmarking.run_parity.
"""

import jax

jax.config.update("jax_platforms", "cpu")

from benchmarking.run_parity import main

if __name__ == "__main__":
    main()

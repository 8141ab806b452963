"""Multi-host (multi-process) execution: initialization, hybrid meshes, and
host-local <-> global array plumbing.

The reference has no multi-host story at all (SURVEY §2.8 — its only
parallelism is SubprocVecEnv workers and Ray whole-run sweeps). This module
is the from-scratch TPU-pod design:

* Each host runs one process (`initialize`), owns its local chips, and steps
  its own shard of environments (device envs shard naturally; host/bridge
  envs are per-process by construction).
* The global mesh is hybrid: the ``dp`` axis factors as
  (hosts over DCN) x (local chips over ICI), so gradient psums hit ICI first
  and cross DCN once per step; ``tp`` stays inside a host (ICI only).
* Host-produced data (bridge-env rollout chunks, demo batches) enters the
  global program via `host_local_to_global`
  (`jax.make_array_from_process_local_data`), which keeps every shard on the
  host that produced it — zero cross-host data movement at input time.

Works identically on a real pod slice and on a simulated multi-process CPU
setup (N processes x M virtual devices; see tests/parallel/test_distributed.py).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils, multihost_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Initializes multi-process JAX.

    On TPU pods all arguments are auto-detected from the TPU metadata
    (call with no args). For CPU simulation / bring-your-own-cluster, pass
    coordinator_address="host:port", num_processes, process_id — or set
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.

    No-op when neither arguments nor env vars request multi-process mode.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    on_pod = os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None and not on_pod:
        return  # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def make_global_mesh(tp: int = 1) -> Mesh:
    """Builds the hybrid ('dp', 'tp') mesh over ALL processes' devices.

    ``dp`` factors as processes (DCN) x local-chips/tp (ICI): contiguous
    local devices sit adjacent along dp, so the psum's ICI stage reduces
    within a host before a single DCN hop. ``tp`` never crosses DCN.
    """
    n_local = jax.local_device_count()
    n_proc = jax.process_count()
    if n_local % tp != 0:
        raise ValueError(f"{n_local} local devices not divisible by tp={tp}")
    dp_ici = n_local // tp
    if n_proc == 1:
        devices = mesh_utils.create_device_mesh((dp_ici, tp))
        return Mesh(devices, ("dp", "tp"))
    try:
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(dp_ici, tp),
            dcn_mesh_shape=(n_proc, 1),
        )
    except ValueError:
        # Simulated multi-process (CPU) devices report a single slice;
        # group by process manually — same property (process-major dp, tp
        # within a process).
        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        devices = np.asarray(devs).reshape(n_proc * dp_ici, tp)
    return Mesh(devices, ("dp", "tp"))


def host_local_to_global(
    local_batch: Any, mesh: Mesh, spec: P = P("dp")
) -> Any:
    """Assembles per-process batches into one global dp-sharded array tree.

    Each process passes ITS OWN shard (e.g. the rollout chunk its bridge
    envs produced); the result is a global jax.Array whose addressable
    shards are exactly the local data — no transfer across DCN.
    """

    def one(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, spec if x.ndim >= 1 else P())
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(one, local_batch)


def replicate_global(tree: Any, mesh: Mesh) -> Any:
    """Replicates host values onto every device of the global mesh.

    For multi-process, plain `device_put` can't target non-addressable
    devices; `host_local_to_global` with an empty spec does the job (all
    processes must pass equal values — asserted in debug builds).
    """
    rep = NamedSharding(mesh, P())

    def one(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, rep)
        return jax.make_array_from_process_local_data(rep, x)

    return jax.tree.map(one, tree)


def global_to_host(tree: Any) -> Any:
    """Fetches fully-replicated global arrays to host numpy (every process
    gets the same value). For dp-sharded arrays use `process_allgather`."""
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


def process_allgather(tree: Any) -> Any:
    """All-gathers dp-sharded arrays so every process sees the full batch
    (e.g. to compute global rollout stats on host)."""
    return multihost_utils.process_allgather(tree, tiled=True)


def barrier(name: str = "imitation_tpu_barrier") -> None:
    multihost_utils.sync_global_devices(name)


def shard_batch_tree_global(tree: Any, mesh: Mesh) -> Any:
    """Multi-process version of ``mesh.shard_batch_tree``.

    Every process passes the FULL host value (identical across processes,
    e.g. an env state produced by a same-seed reset); each keeps only its
    local dp row-block on its own devices. Leaves whose leading dim doesn't
    divide over dp are replicated.
    """
    dp = mesh.shape["dp"]
    n_proc = jax.process_count()
    pid = jax.process_index()
    bsh = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())

    def place(x):
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(
            x.dtype, jax.dtypes.prng_key
        ):
            # typed PRNG keys: shard the raw uint32 data, re-wrap
            return jax.random.wrap_key_data(
                place(np.asarray(jax.random.key_data(x)))
            )
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] % dp == 0 and x.shape[0] >= dp:
            block = x.shape[0] // n_proc
            local = x[pid * block : (pid + 1) * block]
            return jax.make_array_from_process_local_data(bsh, local)
        return jax.make_array_from_process_local_data(rep, x)

    return jax.tree.map(place, tree)


def shard_params_tp_global(params: Any, mesh: Mesh) -> Any:
    """Multi-process tensor-parallel placement: dense kernels split their
    output dim over ``tp`` (biases likewise), everything else replicated.

    ``tp`` never crosses a process boundary (make_global_mesh), so each
    process's devices jointly hold ALL tp shards — every process passes the
    identical full array and keeps its local tp split."""
    kernel_sh = NamedSharding(mesh, P(None, "tp"))
    bias_sh = NamedSharding(mesh, P("tp"))
    rep = NamedSharding(mesh, P())
    tp = mesh.shape["tp"]

    def place(path, x):
        x = np.asarray(x)
        names = [getattr(p, "key", str(p)) for p in path]
        leaf = names[-1] if names else ""
        if leaf == "kernel" and x.ndim == 2 and x.shape[1] % tp == 0:
            return jax.make_array_from_process_local_data(kernel_sh, x)
        if leaf == "bias" and x.ndim == 1 and x.shape[0] % tp == 0:
            return jax.make_array_from_process_local_data(bias_sh, x)
        return jax.make_array_from_process_local_data(rep, x)

    return jax.tree_util.tree_map_with_path(place, params)


def shard_rl_state_global(state: Any, mesh: Mesh, tp_params: bool = False) -> Any:
    """Places an RLState for multi-process SPMD training: env batch sharded
    over the global dp axis (process-major), params/opt replicated (or
    tp-sharded with ``tp_params=True``).

    Counterpart of ``mesh.shard_rl_state`` (single-process); requires every
    process to hold the identical full state (same seed init)."""
    placed_env = (
        shard_batch_tree_global(state.env_state, mesh)
        if state.env_state is not None
        else None
    )
    # PRNG keys are typed arrays; replicate the raw data and re-wrap.
    key = jax.random.wrap_key_data(
        replicate_global(np.asarray(jax.random.key_data(state.key)), mesh)
    )
    kwargs = {}
    if getattr(state, "reward_norm", None) is not None:
        # per-env return accumulators shard with the env batch
        kwargs["reward_norm"] = shard_batch_tree_global(state.reward_norm, mesh)
    place_params = (
        (lambda t: shard_params_tp_global(t, mesh))
        if tp_params
        else (lambda t: replicate_global(t, mesh))
    )
    return state.replace(
        variables=place_params(state.variables),
        opt_state=place_params(state.opt_state),
        env_state=placed_env,
        key=key,
        timesteps=replicate_global(state.timesteps, mesh),
        n_updates=replicate_global(state.n_updates, mesh),
        **kwargs,
    )


def shard_adversarial_trainer_global(trainer: Any, mesh: Mesh) -> Any:
    """Multi-process counterpart of ``mesh.shard_adversarial_trainer``:
    places an AdversarialTrainer's full fused-path state on the GLOBAL mesh
    so ``train_fused`` runs SPMD across processes.

    Layout mirrors the single-process helper: generator env batch sharded
    over global dp (process-major row blocks), all parameters/optimizer
    states/replay/demo batch replicated — every process must hold the
    identical full host state (same-seed construction) before the call.
    """
    if trainer.gen_state is None:
        trainer.gen_state = trainer.gen_algo.init_state()
    trainer.gen_state = shard_rl_state_global(trainer.gen_state, mesh)
    key = jax.random.wrap_key_data(
        replicate_global(np.asarray(jax.random.key_data(trainer.disc_state.key)), mesh)
    )
    trainer.disc_state = trainer.disc_state.replace(
        variables=replicate_global(trainer.disc_state.variables, mesh),
        opt_state=replicate_global(trainer.disc_state.opt_state, mesh),
        key=key,
        step=replicate_global(np.asarray(trainer.disc_state.step), mesh),
    )
    if trainer._gen_buffer_state is None:
        trainer._gen_buffer_state = trainer._gen_replay_buffer.init_state(
            trainer._example_transitions()
        )
    trainer._gen_buffer_state = replicate_global(trainer._gen_buffer_state, mesh)
    trainer._demo_store = type(trainer._demo_store)(
        batch=replicate_global(trainer._demo_store.batch, mesh)
    )
    return trainer


def local_env_count(global_num_envs: int) -> int:
    """Number of envs THIS process should step for a global env batch."""
    n = jax.process_count()
    if global_num_envs % n != 0:
        raise ValueError(
            f"global_num_envs={global_num_envs} not divisible by "
            f"{n} processes"
        )
    return global_num_envs // n

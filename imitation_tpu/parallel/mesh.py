"""Device-mesh utilities: sharding layouts for multi-chip training.

The reference has no distributed backend at all (SURVEY §2.8: a single
process, SubprocVecEnv workers, Ray only for whole-run sweeps). This module
is the from-scratch TPU story:

* Mesh axes: ``dp`` (data parallel — env instances, replay shards,
  minibatches) and ``tp`` (tensor parallel — hidden dims of policy/reward
  nets; reserved, size 1 for the small benchmark nets).
* Batched pytrees (env state, rollout chunks, replay) shard their leading
  batch dim over ``dp``; parameters and optimizer state shard over ``tp``
  (replicated when tp=1). XLA then inserts the psum for gradient reduction
  over ``dp`` and all-gathers for ``tp`` automatically — collectives ride
  ICI, no hand-written NCCL analogue.

All helpers work identically on a virtual CPU mesh
(``--xla_force_host_platform_device_count``) and a real TPU slice.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Builds a ('dp', 'tp') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        if n % tp != 0:
            raise ValueError(f"{n} devices not divisible by tp={tp}")
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays whose LEADING axis is the env/batch dim."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_tree(tree: Any, mesh: Mesh) -> Any:
    """Places every leaf with its leading dim sharded over dp (rank>=1),
    scalars replicated."""
    bsh = batch_sharding(mesh)
    rep = replicated(mesh)

    def place(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 1 and x.shape[0] % mesh.shape["dp"] == 0:
            return jax.device_put(x, bsh)
        return jax.device_put(x, rep)

    return jax.tree.map(place, tree)


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(jax.numpy.asarray(x), rep), tree)


def shard_params_tp(params: Any, mesh: Mesh) -> Any:
    """Tensor-parallel placement for MLP parameters.

    Dense kernels [in, out] shard the output dim over ``tp``; biases [out]
    shard over ``tp``; everything else replicates. With tp=1 this is
    replication — the layout is ready for large reward/policy nets without
    touching model code (matches SURVEY §2.8 note: axes reserved for TP).
    """
    kernel_sh = NamedSharding(mesh, P(None, "tp"))
    bias_sh = NamedSharding(mesh, P("tp"))
    rep = replicated(mesh)

    def place(path, x):
        x = jax.numpy.asarray(x)
        names = [getattr(p, "key", str(p)) for p in path]
        leaf = names[-1] if names else ""
        if leaf == "kernel" and x.ndim == 2 and x.shape[1] % mesh.shape["tp"] == 0:
            return jax.device_put(x, kernel_sh)
        if leaf == "bias" and x.ndim == 1 and x.shape[0] % mesh.shape["tp"] == 0:
            return jax.device_put(x, bias_sh)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map_with_path(place, params)


def shard_adversarial_trainer(trainer: Any, mesh: Mesh, tp_params: bool = True) -> Any:
    """Places an AdversarialTrainer's FULL fused-path state on ``mesh`` so
    that ``train_fused`` (the multi-round scanned program) runs sharded.

    Layout: generator env state batch-sharded over ``dp``; policy + reward
    net params and optimizer states tp-sharded (replicated at tp=1); the
    generator replay ring and demo batch replicated (both are sampled with
    identical keys on every device, so replication keeps disc batches
    bit-identical across the mesh without a gather). jit propagates these
    input shardings through the scan — XLA inserts dp-psums for gradient
    reduction and tp-collectives for the matmuls.
    """
    if trainer.gen_state is None:
        trainer.gen_state = trainer.gen_algo.init_state()
    trainer.gen_state = shard_rl_state(trainer.gen_state, mesh, tp_params)
    place = (
        (lambda t: shard_params_tp(t, mesh))
        if tp_params
        else (lambda t: replicate_tree(t, mesh))
    )
    trainer.disc_state = trainer.disc_state.replace(
        variables=place(trainer.disc_state.variables),
        opt_state=place(trainer.disc_state.opt_state),
        key=jax.device_put(trainer.disc_state.key, replicated(mesh)),
        step=jax.device_put(trainer.disc_state.step, replicated(mesh)),
    )
    if trainer._gen_buffer_state is None:
        trainer._gen_buffer_state = trainer._gen_replay_buffer.init_state(
            trainer._example_transitions()
        )
    trainer._gen_buffer_state = replicate_tree(trainer._gen_buffer_state, mesh)
    trainer._demo_store = type(trainer._demo_store)(
        batch=replicate_tree(trainer._demo_store.batch, mesh)
    )
    return trainer


def shard_sac_state(state: Any, mesh: Mesh, tp_params: bool = True) -> Any:
    """Places a SACState on ``mesh``: actor/critic/target params and their
    optimizer states tp-sharded (replicated at tp=1), env state and the
    replay ring batch-sharded over ``dp`` (ring capacity divisible by dp;
    indivisible leaves and scalars replicate), temperature and RNG
    replicated. Covers the PEBBLE (SAC generator) RLHF configuration."""
    place = (
        (lambda t: shard_params_tp(t, mesh))
        if tp_params
        else (lambda t: replicate_tree(t, mesh))
    )
    rep = replicated(mesh)
    put_rep = lambda x: jax.device_put(jax.numpy.asarray(x), rep)
    return state.replace(
        actor_params=place(state.actor_params),
        critic_params=place(state.critic_params),
        target_critic_params=place(state.target_critic_params),
        log_alpha=put_rep(state.log_alpha),
        actor_opt=place(state.actor_opt),
        critic_opt=place(state.critic_opt),
        alpha_opt=replicate_tree(state.alpha_opt, mesh),
        env_state=(
            shard_batch_tree(state.env_state, mesh)
            if state.env_state is not None else None
        ),
        buffer_state=shard_batch_tree(state.buffer_state, mesh),
        key=put_rep(state.key),
        timesteps=put_rep(state.timesteps),
        n_updates=put_rep(state.n_updates),
    )


def shard_preference_comparisons(pc: Any, mesh: Mesh, tp_params: bool = True) -> Any:
    """Places a PreferenceComparisons run's full state on ``mesh`` (SURVEY
    §2.8: the mesh story must cover the flagship RLHF module).

    Layout: reward-trainer params + optimizer state tp-sharded (replicated
    at tp=1); every reward-update fragment batch dp-sharded on its sample
    axis (member axis stays unsharded for ensembles — the sample axis is
    axis 1 there); the agent trainer's RL/SAC state placed via
    ``shard_rl_state`` / ``shard_sac_state`` (env batch over dp, params
    over tp). XLA then inserts dp-psums for both reward-net and policy
    gradients and tp collectives for the matmuls.
    """
    from imitation_tpu.algorithms.preference_comparisons import (
        AgentTrainer,
        EnsembleTrainer,
        SACAgentTrainer,
    )

    rt = pc.reward_trainer
    dp = mesh.shape["dp"]
    if rt.batch_size % dp != 0:
        raise ValueError(
            f"reward trainer batch_size={rt.batch_size} must be divisible "
            f"by dp={dp} to shard fragment batches"
        )
    place = (
        (lambda t: shard_params_tp(t, mesh))
        if tp_params
        else (lambda t: replicate_tree(t, mesh))
    )
    if rt.variables is None:
        raise RuntimeError("reward trainer not attached; build the "
                           "PreferenceComparisons first")
    rt.variables = place(rt.variables)
    rt.opt_state = place(rt.opt_state)
    sample_axis = 1 if isinstance(rt, EnsembleTrainer) else 0
    rt.batch_sharding = NamedSharding(
        mesh, P(*([None] * sample_axis + ["dp"]))
    )
    pc.reward_variables = rt.variables

    tg = pc.trajectory_generator
    if isinstance(tg, SACAgentTrainer):
        tg.state = shard_sac_state(tg.state, mesh, tp_params)
    elif isinstance(tg, AgentTrainer):
        tg.state = shard_rl_state(tg.state, mesh, tp_params)
    if getattr(tg, "reward_variables", None) is not None:
        tg.reward_variables = rt.variables
    return pc


def shard_rl_state(state: Any, mesh: Mesh, tp_params: bool = True) -> Any:
    """Places an RLState (or similar): env_state batch-sharded over dp,
    variables/opt_state tp-sharded (or replicated), scalars replicated."""
    from imitation_tpu.rl.common import RLState

    placed_env = shard_batch_tree(state.env_state, mesh)
    place_params = (
        (lambda t: shard_params_tp(t, mesh)) if tp_params else (lambda t: replicate_tree(t, mesh))
    )
    return state.replace(
        variables=place_params(state.variables),
        opt_state=place_params(state.opt_state),
        env_state=placed_env,
        key=jax.device_put(state.key, replicated(mesh)),
        timesteps=jax.device_put(state.timesteps, replicated(mesh)),
        n_updates=jax.device_put(state.n_updates, replicated(mesh)),
    )

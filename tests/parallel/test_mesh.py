"""Mesh-sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imitation_tpu.parallel import mesh as mesh_mod


def test_make_mesh_shapes():
    m = mesh_mod.make_mesh(dp=4, tp=2)
    assert m.shape == {"dp": 4, "tp": 2}
    m2 = mesh_mod.make_mesh(tp=2)
    assert m2.shape["dp"] == 4
    with pytest.raises(ValueError):
        mesh_mod.make_mesh(dp=3, tp=2)


def test_shard_batch_tree():
    m = mesh_mod.make_mesh(dp=8, tp=1)
    tree = {"a": jnp.zeros((16, 3)), "b": jnp.zeros(())}
    placed = mesh_mod.shard_batch_tree(tree, m)
    # batch leaf sharded over dp
    shard_shapes = [s.data.shape for s in placed["a"].addressable_shards]
    assert all(s == (2, 3) for s in shard_shapes)
    # scalar replicated
    assert placed["b"].sharding.is_fully_replicated


def test_shard_params_tp():
    m = mesh_mod.make_mesh(dp=4, tp=2)
    params = {"dense": {"kernel": jnp.zeros((6, 8)), "bias": jnp.zeros((8,))}}
    placed = mesh_mod.shard_params_tp(params, m)
    k_shards = [s.data.shape for s in placed["dense"]["kernel"].addressable_shards]
    assert all(s == (6, 4) for s in k_shards)


def test_sharded_gail_round_runs():
    """Full GAIL round over a dp x tp mesh (the dryrun as a test)."""
    from imitation_tpu.algorithms.adversarial.gail import GAIL
    from imitation_tpu.data.rollout import chunk_to_transitions
    from imitation_tpu.envs import make_vec_env
    from imitation_tpu.rl.ppo import PPOConfig
    from imitation_tpu.testing import experts

    m = mesh_mod.make_mesh(dp=4, tp=2)
    venv = make_vec_env("CartPole-v1", num_envs=8, max_episode_steps=16)
    demos = experts.generate_expert_trajectories("CartPole-v1", venv, min_episodes=2)
    trainer = GAIL(
        demonstrations=demos,
        demo_batch_size=16,
        venv=venv,
        gen_config=PPOConfig(n_steps=8, n_minibatches=2, n_epochs=1),
        allow_variable_horizon=True,
    )
    with m:
        gen_state = mesh_mod.shard_rl_state(trainer.gen_algo.init_state(), m)
        disc_vars = mesh_mod.shard_params_tp(trainer.disc_state.variables, m)
        disc_state = trainer.disc_state.replace(variables=disc_vars)
        gen_state, metrics, chunk = trainer.gen_algo._train_step_jit(
            gen_state, disc_state.variables
        )
        transitions = jax.jit(chunk_to_transitions)(chunk)
        buf = trainer._gen_replay_buffer.init_state(transitions)
        buf = jax.jit(trainer._gen_replay_buffer.store)(buf, transitions)
        disc_state, stats = trainer._disc_step_jit(
            disc_state, buf, gen_state.variables, trainer._demo_store.batch
        )
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(stats["disc_loss"]))

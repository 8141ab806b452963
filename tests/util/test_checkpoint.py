"""Checkpoint/resume tests: exact loop-state round trip through orbax."""

import jax
import numpy as np
import pytest

from imitation_tpu.envs import make_vec_env
from imitation_tpu.models.policies import ActorCriticPolicy
from imitation_tpu.rl.ppo import PPO, PPOConfig
from imitation_tpu.util.checkpoint import CheckpointManager, restore_state, save_state


def make_ppo_state():
    venv = make_vec_env("CartPole-v1", num_envs=2, max_episode_steps=20)
    policy = ActorCriticPolicy(
        observation_space=venv.observation_space, action_space=venv.action_space
    )
    ppo = PPO(venv, policy, PPOConfig(n_steps=8, n_minibatches=2, n_epochs=1))
    return ppo, ppo.init_state()


def test_rl_state_roundtrip(tmp_path):
    ppo, state = make_ppo_state()
    state, _ = ppo._train_step_jit(state)
    save_state(str(tmp_path / "ckpt"), state)
    template = ppo.init_state()
    restored = restore_state(str(tmp_path / "ckpt"), template)
    # params identical
    for a, b in zip(
        jax.tree.leaves(state.variables["params"]),
        jax.tree.leaves(restored.variables["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.timesteps) == int(state.timesteps)
    # resumed state is usable: exact continuation works
    s1, m1 = ppo._train_step_jit(state)
    s2, m2 = ppo._train_step_jit(restored)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)


def test_checkpoint_manager_retention(tmp_path):
    ppo, state = make_ppo_state()
    mgr = CheckpointManager(str(tmp_path), max_to_keep=2, save_every=2)
    for step in range(1, 7):
        mgr.maybe_save(step, state)
    assert mgr.all_steps() == [4, 6]
    restored = mgr.restore_latest(ppo.init_state())
    assert int(restored.timesteps) == int(state.timesteps)


def test_restore_latest_empty_raises(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    with pytest.raises(FileNotFoundError):
        mgr.restore_latest(None)

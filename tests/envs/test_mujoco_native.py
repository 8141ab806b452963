"""Lockstep MuJoCo engine parity vs the per-env gym bridge.

Mirrors the reference's reliance on Gymnasium MuJoCo correctness: we assert
our batched native stepping reproduces gym's dynamics, rewards, and episode
bookkeeping exactly (same state -> same step outputs), reference
benchmarking/README.md:3-6 envs.
"""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from imitation_tpu.envs import make_vec_env, registry  # noqa: E402
from imitation_tpu.envs import mujoco_native  # noqa: E402

ENVS = ["seals/HalfCheetah-v1", "seals/Hopper-v1", "seals/Walker2d-v1",
        "seals/Swimmer-v1"]


@pytest.mark.parametrize("env_id", ENVS)
def test_rewards_match_gym_given_same_state(env_id):
    """Set the gym env to the lockstep env's exact state, step both with the
    same action, and compare obs and reward."""
    venv = make_vec_env(env_id, num_envs=3)
    assert isinstance(venv, mujoco_native.MujocoLockstepVectorEnv)
    gym_env = registry.make_env(env_id).make()
    gym_env.reset(seed=0)
    raw = gym_env.unwrapped

    rng = np.random.default_rng(7)
    obs = venv.reset(seed=1)
    for step in range(5):
        acts = rng.uniform(-1, 1, size=(3,) + venv.action_space.shape)
        # put gym env into env 1's state
        qpos = venv._states[1, 1 : 1 + venv._nq].copy()
        qvel = venv._states[1, 1 + venv._nq :].copy()
        raw.set_state(qpos, qvel)
        out = venv.step(acts.astype(np.float32))
        g_obs, g_rew, g_term, g_trunc, g_info = gym_env.step(
            acts[1].astype(np.float32)
        )
        np.testing.assert_allclose(out["obs"][1], g_obs, rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(out["reward"][1], g_rew, rtol=1e-6)
        assert not g_term


@pytest.mark.parametrize("env_id", ENVS)
def test_fixed_horizon_autoreset(env_id):
    venv = make_vec_env(env_id, num_envs=2, max_episode_steps=7)
    obs = venv.reset(seed=0)
    acts = np.zeros((2,) + venv.action_space.shape, np.float32)
    rets = np.zeros(2)
    for t in range(7):
        out = venv.step(acts)
        rets += out["reward"]
        if t < 6:
            assert not out["truncated"].any()
    assert out["truncated"].all()
    assert not out["terminated"].any()
    np.testing.assert_allclose(out["episode_return"], rets, rtol=1e-5)
    assert (out["episode_length"] == 7).all()
    # terminal_obs is pre-reset, obs is the fresh episode's first obs
    assert not np.allclose(out["obs"], out["terminal_obs"])
    # next episode starts clean
    out2 = venv.step(acts)
    assert (out2["episode_length"] == 1).all()


def test_reset_noise_distribution():
    venv = make_vec_env("seals/Hopper-v1", num_envs=256)
    obs = venv.reset(seed=3)
    qpos = venv._states[:, 1 : 1 + venv._nq]
    spread = qpos - venv._init_qpos
    assert np.abs(spread).max() <= 5e-3 + 1e-12
    assert np.abs(spread).max() > 1e-3  # actually noisy


def test_ant_lockstep_parity_with_gym():
    """Ant's cfrc path: sync gym's full dynamical state (qpos/qvel AND
    qacc_warmstart — cfrc_ext is warmstart-sensitive) to lockstep env 1 each
    step, then compare obs (incl. contact forces) and reward bit-for-bit."""
    venv = make_vec_env("seals/Ant-v1", num_envs=2)
    assert isinstance(venv, mujoco_native.MujocoLockstepVectorEnv)
    assert venv._has_cfrc
    gym_env = registry.make_env("seals/Ant-v1").make()
    gym_env.reset(seed=0)
    raw = gym_env.unwrapped

    rng = np.random.default_rng(11)
    venv.reset(seed=1)
    # Sync ONCE at reset, then run both continuously: gymnasium's forward
    # reward reads the (substep-stale) body xpos, so a per-step teleport
    # would give gym a fresh baseline our continuously-run env never has.
    ours = venv._env_datas[1]
    raw.set_state(ours.qpos.copy(), ours.qvel.copy())
    raw.data.qacc_warmstart[:] = ours.qacc_warmstart
    for step in range(5):
        acts = rng.uniform(-1, 1, size=(2,) + venv.action_space.shape)
        out = venv.step(acts.astype(np.float32))
        g_obs, g_rew, g_term, g_trunc, g_info = gym_env.step(
            acts[1].astype(np.float32)
        )
        np.testing.assert_allclose(out["obs"][1], g_obs, rtol=1e-9, atol=1e-9)
        # our reward is stored float32 — allow one float32 ulp of slack
        np.testing.assert_allclose(
            out["reward"][1], g_rew, rtol=1e-6, atol=1e-6
        )
        assert not g_term
    venv.close()


def test_ant_reset_zeroes_contact_obs():
    """Gymnasium resets via mj_forward, which does not recompute cfrc_ext —
    the first obs of every episode has zero contact forces. Match that."""
    venv = make_vec_env("seals/Ant-v1", num_envs=2)
    obs = venv.reset(seed=4)
    assert (obs[:, 29:] == 0).all()
    acts = np.ones((2,) + venv.action_space.shape, np.float32) * 0.5
    for _ in range(10):  # ant falls to the ground within a few frames
        out = venv.step(acts)
    assert np.abs(out["obs"][:, 29:]).max() > 0  # contacts after stepping
    venv.close()

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


def test_ant_stays_on_bridge():
    from imitation_tpu.envs.gym_bridge import HostVectorEnv

    venv = make_vec_env("seals/Ant-v1", num_envs=2)
    assert isinstance(venv, HostVectorEnv)
    venv.close()

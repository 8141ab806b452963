"""Gym-bridge tests: host vector env, MuJoCo seals variants, host rollout."""

import numpy as np
import pytest

from imitation_tpu.data import rollout
from imitation_tpu.envs import make_env, make_vec_env
from imitation_tpu.envs.gym_bridge import GymHostEnv, HostVectorEnv
from imitation_tpu.models.policies import RandomPolicy


def test_host_vector_env_basic():
    venv = make_vec_env("MountainCarContinuous-v0", num_envs=2)
    # pure-JAX version exists -> device env, not host
    assert not getattr(venv, "is_host", False)


def test_gym_host_env_spaces():
    env = GymHostEnv("CartPole-v1")
    assert env.observation_space.shape == (4,)
    assert env.action_space.n == 2
    with pytest.raises(TypeError, match="host env"):
        env.reset(None)


def test_host_vector_env_step_and_autoreset():
    env = GymHostEnv("CartPole-v1")
    venv = HostVectorEnv(env, num_envs=3, max_episode_steps=10, num_threads=2)
    obs = venv.reset(seed=0)
    assert obs.shape == (3, 4)
    done_seen = False
    for t in range(12):
        out = venv.step(np.ones(3, np.int64))
        done = out["terminated"] | out["truncated"]
        if done.any():
            done_seen = True
            i = int(np.flatnonzero(done)[0])
            # monitor length equals steps since episode start
            assert out["episode_length"][i] >= 1
            assert not np.allclose(out["obs"][i], out["terminal_obs"][i])
    assert done_seen
    venv.close()


def test_generate_trajectories_host_dispatch():
    env = GymHostEnv("CartPole-v1")
    venv = HostVectorEnv(env, num_envs=2, max_episode_steps=10)
    pol = RandomPolicy(venv.observation_space, venv.action_space)
    trajs = rollout.generate_trajectories(
        pol.sample_fn(), {}, venv, rollout.make_min_episodes(4), rng=0, chunk_size=16
    )
    assert len(trajs) >= 4
    for t in trajs:
        assert len(t) <= 10
        assert t.obs.shape == (len(t) + 1, 4)
        assert t.rews.sum() == len(t)
    venv.close()


@pytest.mark.slow
def test_seals_half_cheetah_bridge():
    venv = make_vec_env("seals/HalfCheetah-v0", num_envs=2)
    assert venv.is_host
    # seals variant includes positions: obs dim 18 (17 + root x)
    assert venv.observation_space.shape == (18,)
    pol = RandomPolicy(venv.observation_space, venv.action_space)
    trajs = rollout.generate_trajectories(
        pol.sample_fn(), {}, venv, rollout.make_min_timesteps(100), rng=0,
        chunk_size=64,
    )
    assert sum(len(t) for t in trajs) >= 100
    venv.close()


@pytest.mark.slow
def test_seals_walker_no_early_termination():
    venv = make_vec_env("seals/Walker2d-v0", num_envs=2, max_episode_steps=50)
    pol = RandomPolicy(venv.observation_space, venv.action_space)
    trajs = rollout.generate_trajectories(
        pol.sample_fn(), {}, venv, rollout.make_min_episodes(2), rng=0,
        chunk_size=50,
    )
    # with terminate_when_unhealthy=False every episode runs the full horizon
    assert all(len(t) == 50 for t in trajs)
    venv.close()

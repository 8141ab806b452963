"""C++ env engine tests: build, dynamics parity with gymnasium, throughput."""

import numpy as np
import pytest

pytest.importorskip("ctypes")


@pytest.fixture(scope="module")
def lib():
    from imitation_tpu.native.build import load_library

    try:
        return load_library()
    except Exception as e:
        pytest.skip(f"native build unavailable: {e}")


def test_build_and_create(lib):
    from imitation_tpu.native import make_cpp_vec_env

    venv = make_cpp_vec_env("CartPole-v1", num_envs=4)
    obs = venv.reset()
    assert obs.shape == (4, 4)
    assert np.abs(obs).max() <= 0.05
    venv.close()


def test_cpp_cartpole_matches_gymnasium(lib):
    """Same action sequence from same state gives the same trajectory."""
    import gymnasium as gym

    from imitation_tpu.native import make_cpp_vec_env

    genv = gym.make("CartPole-v1").unwrapped
    gobs, _ = genv.reset(seed=0)
    venv = make_cpp_vec_env("CartPole-v1", num_envs=1)
    venv.reset()
    # Force the C++ engine to gym's state via its internal buffer.
    import ctypes

    state = np.asarray(genv.state, np.float32)[None]
    # write state directly: reset then overwrite via step from known state
    # (engine state is private; instead step both from the SAME state by
    # setting gym's state to a fresh C++ reset state)
    venv2 = make_cpp_vec_env("CartPole-v1", num_envs=1, seed=123)
    obs0 = venv2.reset()
    genv.state = obs0[0].astype(np.float64)
    rng = np.random.default_rng(0)
    for t in range(30):
        a = int(rng.integers(2))
        out = venv2.step(np.asarray([a]))
        gobs, grew, gterm, gtrunc, _ = genv.step(a)
        np.testing.assert_allclose(out["terminal_obs"][0], gobs, rtol=1e-4, atol=1e-5)
        assert bool(out["terminated"][0]) == bool(gterm)
        if gterm:
            break
    genv.close()
    venv2.close()


def test_cpp_autoreset_and_monitor(lib):
    from imitation_tpu.native import make_cpp_vec_env

    venv = make_cpp_vec_env("CartPole-v1", num_envs=3, max_episode_steps=5)
    venv.reset()
    for t in range(5):
        out = venv.step(np.zeros(3))
    assert (out["terminated"] | out["truncated"]).all()
    np.testing.assert_array_equal(out["episode_length"], [5, 5, 5])
    np.testing.assert_array_equal(out["episode_return"], [5.0, 5.0, 5.0])
    # after auto-reset the next episode restarts counting
    out = venv.step(np.zeros(3))
    np.testing.assert_array_equal(out["episode_length"], [1, 1, 1])
    venv.close()


def test_cpp_pendulum_continuous(lib):
    from imitation_tpu.native import make_cpp_vec_env

    venv = make_cpp_vec_env("Pendulum-v1", num_envs=2, max_episode_steps=10)
    obs = venv.reset()
    assert obs.shape == (2, 3)
    out = venv.step(np.zeros((2, 1)))
    assert (out["reward"] <= 0).all()
    venv.close()


def test_cpp_rollout_integration(lib):
    """CppVectorEnv works with the host rollout path."""
    from imitation_tpu.data import rollout
    from imitation_tpu.models.policies import RandomPolicy
    from imitation_tpu.native import make_cpp_vec_env

    venv = make_cpp_vec_env("CartPole-v1", num_envs=4, max_episode_steps=20)
    pol = RandomPolicy(venv.observation_space, venv.action_space)
    trajs = rollout.generate_trajectories(
        pol.sample_fn(), {}, venv, rollout.make_min_episodes(4), rng=0, chunk_size=32
    )
    assert len(trajs) >= 4
    for t in trajs:
        assert t.rews.sum() == len(t)
    venv.close()


@pytest.mark.slow
def test_cpp_throughput_beats_python_loop(lib):
    """The native engine should beat per-env Python stepping comfortably."""
    import time

    from imitation_tpu.envs.gym_bridge import GymHostEnv, HostVectorEnv
    from imitation_tpu.native import make_cpp_vec_env

    B, T = 64, 200

    def cpp_rate_once():
        cpp = make_cpp_vec_env("CartPole-v1", num_envs=B)
        cpp.reset()
        acts = np.zeros(B)
        t0 = time.perf_counter()
        for _ in range(T):
            cpp.step(acts)
        rate = B * T / (time.perf_counter() - t0)
        cpp.close()
        return rate

    def py_rate_once():
        py = HostVectorEnv(GymHostEnv("CartPole-v1"), num_envs=B, num_threads=1)
        py.reset(seed=0)
        t0 = time.perf_counter()
        for _ in range(T // 4):
            py.step(np.zeros(B, np.int64))
        rate = B * (T // 4) / (time.perf_counter() - t0)
        py.close()
        return rate

    # 2x margin flags a real regression (observed win quiet is ~2.5-4x);
    # best-of-3 keeps a loaded 2-vCPU host (concurrent benchmark lanes)
    # from flaking a wall-clock comparison via scheduler noise.
    last = (0.0, 1.0)
    for _ in range(3):
        cpp_rate, py_rate = cpp_rate_once(), py_rate_once()
        last = (cpp_rate, py_rate)
        if cpp_rate > 2 * py_rate:
            return
    assert False, f"cpp {last[0]:.0f} vs py {last[1]:.0f} steps/s (best of 3)"

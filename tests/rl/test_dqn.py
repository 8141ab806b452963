"""DQN learner tests: epsilon schedule, TD mechanics, learning gate.

The reference delegates DQN to SB3 (SQIL default algo, sqil.py:26); these
tests define our jitted learner's contract.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imitation_tpu.envs import make_vec_env
from imitation_tpu.rl.dqn import DQN, DQNConfig


@pytest.fixture
def dqn():
    venv = make_vec_env("CartPole-v1", num_envs=4, max_episode_steps=100)
    return DQN(
        venv,
        DQNConfig(
            learning_starts=64, batch_size=32, train_freq=8,
            learning_rate=1e-3,
        ),
        seed=0,
    )


def test_continuous_action_space_rejected():
    venv = make_vec_env("Pendulum-v1", num_envs=2)
    with pytest.raises(ValueError):
        DQN(venv, DQNConfig())


def test_epsilon_schedule_decays(dqn):
    e0 = float(dqn.epsilon(jnp.asarray(0)))
    e_mid = float(dqn.epsilon(jnp.asarray(10_000)))
    e_end = float(dqn.epsilon(jnp.asarray(10**7)))
    assert e0 >= e_mid >= e_end
    assert e0 > e_end


def test_train_step_advances_state(dqn):
    state = dqn.init_state()
    state2, metrics = dqn._train_step_jit(state)
    assert int(state2.timesteps) > int(state.timesteps)
    assert np.isfinite(float(metrics["loss"])) or int(state2.timesteps) < 64


def test_greedy_fn_returns_valid_actions(dqn):
    state = dqn.init_state()
    obs = jnp.zeros((5, 4))
    acts, _ = dqn.greedy_fn()(state.variables, obs, jax.random.key(0))
    acts = np.asarray(acts)
    assert acts.shape == (5,)
    assert ((acts >= 0) & (acts < 2)).all()


@pytest.mark.slow
def test_dqn_improves_cartpole():
    from imitation_tpu.data import rollout

    venv = make_vec_env("CartPole-v1", num_envs=8, max_episode_steps=200)
    dqn = DQN(
        venv,
        DQNConfig(learning_starts=1000, batch_size=128, train_freq=4,
                  learning_rate=5e-4, target_update_interval=10_000),
        seed=0,
    )
    state = dqn.init_state()

    def ret(variables, seed):
        trajs = rollout.generate_trajectories(
            dqn.greedy_fn(), variables, venv,
            rollout.make_min_episodes(10), rng=seed,
        )
        return float(np.mean([t.rews.sum() for t in trajs]))

    before = ret(state.variables, 1)
    state = dqn.learn(state, 200_000)
    after = ret(state.variables, 2)
    assert after > before + 80, f"{before} -> {after}"


def test_dqn_host_env_path():
    """DQN on a HOST (gym-bridge) env: epsilon-greedy stepping through the
    host collector, identical jitted store+TD-update program per round
    (formerly crashed obscurely at init)."""
    import numpy as np

    from imitation_tpu.data import rollout as rmod
    from imitation_tpu.envs.gym_bridge import GymHostEnv, HostVectorEnv
    from imitation_tpu.rl.dqn import DQN, DQNConfig

    env = GymHostEnv("CartPole-v1")
    venv = HostVectorEnv(env, num_envs=2, max_episode_steps=20, num_threads=1)
    dqn = DQN(
        venv,
        DQNConfig(train_freq=4, gradient_steps=2, learning_starts=16,
                  buffer_size=1000, batch_size=16, hid_sizes=(16,)),
        seed=0,
    )
    state = dqn.init_state()
    assert state.env_state is None
    state, metrics = dqn._train_step_jit(state)
    assert int(state.timesteps) == 4 * 2
    assert int(state.n_updates) == 2
    state = dqn.learn(state, 64)
    assert int(state.timesteps) >= 64
    assert np.isfinite(float(metrics["loss"]))
    trajs = rmod.generate_trajectories(
        dqn.greedy_fn(), state.variables, venv, rmod.make_min_episodes(2), rng=1
    )
    assert all(np.isfinite(np.asarray(t.rews)).all() for t in trajs)
    venv.close()


def test_dqn_host_env_overlapped():
    """DQNConfig.overlap_collection pipelines host stepping with the TD
    update; rounds still advance timesteps/updates by the configured
    amounts and an in-flight background collection exists between rounds."""
    import numpy as np

    from imitation_tpu.envs.gym_bridge import GymHostEnv, HostVectorEnv
    from imitation_tpu.rl.dqn import DQN, DQNConfig

    env = GymHostEnv("CartPole-v1")
    venv = HostVectorEnv(env, num_envs=2, max_episode_steps=20, num_threads=1)
    dqn = DQN(
        venv,
        DQNConfig(train_freq=4, gradient_steps=2, learning_starts=8,
                  buffer_size=1000, batch_size=16, hid_sizes=(16,),
                  overlap_collection=True),
        seed=0,
    )
    state = dqn.init_state()
    metrics = None
    for _ in range(5):
        state, metrics = dqn._train_step_jit(state)
    assert dqn._pending_chunk is not None
    dqn.discard_pending_collection()
    assert dqn._pending_chunk is None
    assert int(state.timesteps) == 5 * 4 * 2
    assert int(state.n_updates) == 5 * 2
    assert np.isfinite(float(metrics["loss"]))
    venv.close()

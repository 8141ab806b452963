"""SQIL + DQN tests (reference tests/algorithms/test_sqil.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imitation_tpu.algorithms.sqil import SQIL
from imitation_tpu.data import rollout
from imitation_tpu.envs import make_vec_env
from imitation_tpu.rl.dqn import DQN, DQNConfig
from imitation_tpu.testing import experts
from imitation_tpu.testing.reward_improvement import is_significant_reward_improvement


@pytest.fixture(scope="module")
def cartpole_demos():
    venv = make_vec_env("CartPole-v1", num_envs=8, max_episode_steps=100)
    return experts.generate_expert_trajectories("CartPole-v1", venv, min_episodes=10)


def test_dqn_step_runs():
    venv = make_vec_env("CartPole-v1", num_envs=4, max_episode_steps=50)
    dqn = DQN(venv, DQNConfig(learning_starts=8, train_freq=4, batch_size=16))
    state = dqn.init_state()
    for _ in range(5):
        state, metrics = dqn._train_step_jit(state)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.timesteps) == 5 * 4 * 4


def test_dqn_continuous_raises():
    venv = make_vec_env("Pendulum-v1", num_envs=2)
    with pytest.raises(ValueError, match="discrete"):
        DQN(venv)


def test_sqil_mixed_sampling(cartpole_demos):
    venv = make_vec_env("CartPole-v1", num_envs=4, max_episode_steps=50)
    sqil = SQIL(
        venv=venv,
        demonstrations=cartpole_demos,
        dqn_config=DQNConfig(learning_starts=8, train_freq=4, batch_size=32),
        allow_variable_horizon=True,
    )
    # exercise the hook directly: rewards must be exactly half 0, half 1
    state = sqil.state
    batch = sqil.dqn.sample_hook(
        sqil.dqn.replay, state.buffer_state, jax.random.key(0), 32
    )
    rews = np.asarray(batch.rews)
    assert (rews[:16] == 0).all()
    assert (rews[16:] == 1).all()


def test_sqil_train_smoke(cartpole_demos):
    venv = make_vec_env("CartPole-v1", num_envs=4, max_episode_steps=50)
    sqil = SQIL(
        venv=venv,
        demonstrations=cartpole_demos,
        dqn_config=DQNConfig(learning_starts=32, train_freq=4, batch_size=32),
        allow_variable_horizon=True,
    )
    sqil.train(total_timesteps=500)
    assert int(sqil.state.timesteps) >= 500


@pytest.mark.slow
def test_sqil_improves_cartpole(cartpole_demos):
    venv = make_vec_env("CartPole-v1", num_envs=8)
    sqil = SQIL(
        venv=venv,
        demonstrations=cartpole_demos,
        dqn_config=DQNConfig(
            learning_starts=500,
            train_freq=4,
            batch_size=64,
            gradient_steps=4,
            learning_rate=3e-4,
            target_update_interval=500,
            exploration_fraction=0.3,
            exploration_final_eps=0.02,
        ),
        allow_variable_horizon=True,
        seed=3,
    )
    novice = rollout.generate_trajectories(
        sqil.policy.sample_fn(), sqil.state.variables, venv,
        rollout.make_min_episodes(10), rng=0,
    )
    novice_rets = [t.rews.sum() for t in novice]
    sqil.train(total_timesteps=30_000)
    trained = rollout.generate_trajectories(
        sqil.policy.sample_fn(), sqil.state.variables, venv,
        rollout.make_min_episodes(10), rng=1,
    )
    trained_rets = [t.rews.sum() for t in trained]
    assert is_significant_reward_improvement(novice_rets, trained_rets)


def test_sqil_sac_continuous():
    """SQIL with a SAC learner on a continuous env (reference tutorial 8a)."""
    from imitation_tpu.rl.sac import SACConfig
    from imitation_tpu.testing import experts as _experts

    venv_d = make_vec_env("Pendulum-v1", num_envs=4)
    demos = _experts.generate_expert_trajectories("Pendulum-v1", venv_d, min_episodes=4)
    venv = make_vec_env("Pendulum-v1", num_envs=4)
    sqil = SQIL(
        venv=venv,
        demonstrations=demos,
        sac_config=SACConfig(learning_starts=32, batch_size=32, buffer_size=2000,
                             actor_hid_sizes=(32,), critic_hid_sizes=(32,)),
        allow_variable_horizon=True,
        seed=0,
    )
    assert sqil.rl_algo_name == "sac"
    sqil.train(total_timesteps=300)
    assert int(sqil.state.timesteps) >= 300
    # policy interface works for rollouts
    trajs = rollout.generate_trajectories(
        sqil.policy.sample_fn(), sqil.policy_variables, venv,
        rollout.make_min_episodes(2), rng=0,
    )
    assert len(trajs) >= 2


def test_sqil_invalid_algo_raises(cartpole_demos):
    venv = make_vec_env("CartPole-v1", num_envs=2)
    with pytest.raises(ValueError, match="rl_algo"):
        SQIL(venv=venv, demonstrations=cartpole_demos, rl_algo="ppo",
             allow_variable_horizon=True)


def test_sqil_host_env():
    """SQIL (DQN variant) trains on a host gym-bridge env — the reference
    runs SQIL on arbitrary gym discrete envs via SB3 (sqil.py:26-102)."""
    import numpy as np

    from imitation_tpu.algorithms.sqil import SQIL
    from imitation_tpu.envs.gym_bridge import GymHostEnv, HostVectorEnv
    from imitation_tpu.rl.dqn import DQNConfig
    from imitation_tpu.testing import experts

    env = GymHostEnv("CartPole-v1")
    venv = HostVectorEnv(env, num_envs=2, max_episode_steps=20, num_threads=1)
    demos = experts.generate_expert_trajectories(
        "CartPole-v1", venv, min_episodes=2, seed=0
    )
    sqil = SQIL(
        venv=venv,
        demonstrations=demos,
        dqn_config=DQNConfig(train_freq=4, gradient_steps=1,
                             learning_starts=16, buffer_size=512,
                             batch_size=16, hid_sizes=(16,)),
        seed=0,
    )
    sqil.train(total_timesteps=64)
    from imitation_tpu.data import rollout as rmod

    trajs = rmod.generate_trajectories(
        sqil.rl.greedy_fn(), sqil.state.variables, venv,
        rmod.make_min_episodes(2), rng=1,
    )
    assert all(np.isfinite(np.asarray(t.rews)).all() for t in trajs)
    venv.close()

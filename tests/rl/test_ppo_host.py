"""PPO over host (gym-bridge) envs — the MuJoCo training path."""

import numpy as np
import pytest

from imitation_tpu.envs.gym_bridge import GymHostEnv, HostVectorEnv
from imitation_tpu.models.policies import ActorCriticPolicy
from imitation_tpu.rl.ppo import PPO, PPOConfig


def make_host_ppo(env_id="CartPole-v1", **cfg):
    env = GymHostEnv(env_id)
    venv = HostVectorEnv(env, num_envs=4, max_episode_steps=50, num_threads=1)
    policy = ActorCriticPolicy(
        observation_space=venv.observation_space, action_space=venv.action_space
    )
    defaults = dict(n_steps=32, n_minibatches=4, n_epochs=2)
    defaults.update(cfg)
    return PPO(venv, policy, PPOConfig(**defaults))


def test_host_ppo_step_runs():
    ppo = make_host_ppo()
    assert ppo.is_host_env
    state = ppo.init_state()
    state, metrics = ppo._train_step_jit(state)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.timesteps) == 32 * 4


def test_host_ppo_params_change():
    import jax

    ppo = make_host_ppo()
    state = ppo.init_state()
    before = jax.tree.map(np.asarray, state.variables["params"])
    state, _ = ppo._train_step_jit(state)
    changed = jax.tree.map(
        lambda a, b: not np.allclose(a, np.asarray(b)), before, state.variables["params"]
    )
    assert any(jax.tree.leaves(changed))


@pytest.mark.slow
def test_gail_on_mujoco_halfcheetah_smoke():
    """GAIL generator loop over seals/HalfCheetah via the bridge (flagship
    benchmark config, tiny scale)."""
    from imitation_tpu.algorithms.adversarial.gail import GAIL
    from imitation_tpu.data import rollout
    from imitation_tpu.envs import make_vec_env
    from imitation_tpu.models.policies import RandomPolicy

    venv = make_vec_env("seals/HalfCheetah-v0", num_envs=2, max_episode_steps=30)
    pol = RandomPolicy(venv.observation_space, venv.action_space)
    demos = rollout.generate_trajectories(
        pol.sample_fn(), {}, venv, rollout.make_min_episodes(2), rng=0, chunk_size=30
    )
    trainer = GAIL(
        demonstrations=demos,
        demo_batch_size=32,
        venv=venv,
        gen_config=PPOConfig(n_steps=16, n_minibatches=2, n_epochs=1),
        allow_variable_horizon=True,
        seed=0,
    )
    trainer.train(total_timesteps=2 * trainer.gen_train_timesteps)
    stats = trainer.train_disc()
    assert np.isfinite(stats["disc_loss"])

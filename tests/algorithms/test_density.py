"""Density-reward tests (reference tests/algorithms/test_density_baselines.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from imitation_tpu.algorithms.density import (
    DensityAlgorithm,
    DensityType,
    gaussian_kde_logpdf,
)
from imitation_tpu.envs import make_vec_env
from imitation_tpu.rl.ppo import PPOConfig
from imitation_tpu.testing import experts


def test_kde_matches_sklearn():
    from sklearn.neighbors import KernelDensity

    rng = np.random.default_rng(0)
    data = rng.normal(size=(50, 3)).astype(np.float32)
    x = rng.normal(size=(7, 3)).astype(np.float32)
    h = 0.7
    skl = KernelDensity(kernel="gaussian", bandwidth=h).fit(data)
    expected = skl.score_samples(x)
    got = gaussian_kde_logpdf(jnp.asarray(x), jnp.asarray(data), h)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def pendulum_demos():
    venv = make_vec_env("Pendulum-v1", num_envs=8)
    return experts.generate_expert_trajectories("Pendulum-v1", venv, min_episodes=8)


@pytest.mark.parametrize(
    "density_type",
    [DensityType.STATE_DENSITY, DensityType.STATE_ACTION_DENSITY,
     DensityType.STATE_STATE_DENSITY],
)
def test_density_reward_shapes(pendulum_demos, density_type):
    venv = make_vec_env("Pendulum-v1", num_envs=4)
    algo = DensityAlgorithm(
        demonstrations=pendulum_demos,
        venv=venv,
        density_type=density_type,
        rl_config=PPOConfig(n_steps=16, n_minibatches=2, n_epochs=1),
    )
    algo.train()
    obs = np.random.randn(5, 3).astype(np.float32)
    acts = np.random.randn(5, 1).astype(np.float32)
    rewards = algo(obs, acts, obs, np.zeros(5))
    assert rewards.shape == (5,)
    assert np.isfinite(rewards).all()


def test_density_expert_scores_higher(pendulum_demos):
    """Expert transitions should get higher reward than random noise."""
    venv = make_vec_env("Pendulum-v1", num_envs=4)
    algo = DensityAlgorithm(
        demonstrations=pendulum_demos, venv=venv,
        rl_config=PPOConfig(n_steps=16, n_minibatches=2, n_epochs=1),
    )
    algo.train()
    t = pendulum_demos[0]
    expert_rew = algo(t.obs[:-1], t.acts, t.obs[1:], np.zeros(len(t)))
    noise_obs = np.random.default_rng(0).uniform(-5, 5, (len(t), 3)).astype(np.float32)
    noise_act = np.random.default_rng(1).uniform(-2, 2, (len(t), 1)).astype(np.float32)
    noise_rew = algo(noise_obs, noise_act, noise_obs, np.zeros(len(t)))
    assert expert_rew.mean() > noise_rew.mean() + 1.0


def test_density_rl_smoke(pendulum_demos):
    venv = make_vec_env("Pendulum-v1", num_envs=4)
    algo = DensityAlgorithm(
        demonstrations=pendulum_demos, venv=venv,
        rl_config=PPOConfig(n_steps=16, n_minibatches=2, n_epochs=1),
    )
    algo.train()
    algo.train_policy(n_timesteps=64)
    stats = algo.test_policy(n_trajectories=2)
    assert "return_mean" in stats


def test_nonstationary_requires_trajectories(pendulum_demos):
    from imitation_tpu.data import rollout as rollout_mod

    venv = make_vec_env("Pendulum-v1", num_envs=4)
    flat = rollout_mod.flatten_trajectories_with_rew(pendulum_demos)
    with pytest.raises(ValueError, match="[Nn]on-stationary"):
        DensityAlgorithm(
            demonstrations=flat, venv=venv, is_stationary=False,
            rl_config=PPOConfig(n_steps=16, n_minibatches=2, n_epochs=1),
        )


def test_density_refit_takes_effect(pendulum_demos):
    """Refitting the KDE changes rewards without re-jitting (staleness fix)."""
    venv = make_vec_env("Pendulum-v1", num_envs=4)
    algo = DensityAlgorithm(
        demonstrations=pendulum_demos, venv=venv,
        rl_config=PPOConfig(n_steps=16, n_minibatches=2, n_epochs=1),
        standardise_inputs=False,
    )
    algo.train()
    obs = np.zeros((3, 3), np.float32)
    acts = np.zeros((3, 1), np.float32)
    r1 = algo(obs, acts, obs, np.zeros(3))
    # refit on shifted demos: rewards at the same point must change
    shifted = [
        type(t)(obs=np.asarray(t.obs) + 5.0, acts=t.acts, rews=t.rews,
                infos=t.infos, terminal=t.terminal)
        for t in pendulum_demos
    ]
    algo.set_demonstrations(shifted)
    algo.train()
    r2 = algo(obs, acts, obs, np.zeros(3))
    assert not np.allclose(r1, r2)

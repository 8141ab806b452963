"""Tests for the testing utilities themselves."""

import jax
import jax.numpy as jnp
import numpy as np

from imitation_tpu.envs.base import Space
from imitation_tpu.testing.reward_nets import MockRewardNet, make_ensemble


def test_mock_reward_net_constant():
    obs_space, act_space = Space.box(-1, 1, (3,)), Space.discrete(2)
    net = MockRewardNet(
        observation_space=obs_space, action_space=act_space, value=2.5
    )
    variables = net.init_variables(jax.random.key(0))
    out = net.apply(variables, jnp.zeros((4, 3)), jnp.zeros(4, jnp.int32),
                    jnp.zeros((4, 3)), jnp.zeros(4))
    np.testing.assert_array_equal(np.asarray(out), 2.5)


def test_make_ensemble():
    obs_space, act_space = Space.box(-1, 1, (3,)), Space.discrete(2)
    ens = make_ensemble(obs_space, act_space, num_members=2)
    variables = ens.init_variables(jax.random.key(0))
    out = ens.apply(variables, jnp.zeros((4, 3)), jnp.zeros(4, jnp.int32),
                    jnp.zeros((4, 3)), jnp.zeros(4))
    assert out.shape == (2, 4)


def test_bc_reconstruct_policy(tmp_path):
    from imitation_tpu.algorithms.bc import BC, reconstruct_policy
    from imitation_tpu.envs import make_vec_env
    from imitation_tpu.testing import experts

    venv = make_vec_env("CartPole-v1", num_envs=2, max_episode_steps=20)
    demos = experts.generate_expert_trajectories("CartPole-v1", venv, min_episodes=2)
    bc = BC(observation_space=venv.observation_space,
            action_space=venv.action_space, demonstrations=demos, rng=0,
            batch_size=8)
    bc.train(n_batches=2)
    bc.save_policy(str(tmp_path / "pol"))
    policy, variables = reconstruct_policy(str(tmp_path / "pol"))
    obs = jnp.zeros((3, 4))
    d1 = bc.policy.distribution(bc.state.variables, obs)
    d2 = policy.distribution(variables, obs)
    np.testing.assert_allclose(np.asarray(d1.logits), np.asarray(d2.logits), rtol=1e-6)

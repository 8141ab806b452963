"""Reward serialization tests (reference tests/rewards/test_serialize.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imitation_tpu.envs import make_vec_env
from imitation_tpu.rewards import reward_nets, serialize


@pytest.fixture
def spaces():
    venv = make_vec_env("CartPole-v1", num_envs=2)
    return venv.observation_space, venv.action_space


def test_basic_roundtrip(tmp_path, spaces):
    obs_space, act_space = spaces
    net = reward_nets.BasicRewardNet(
        observation_space=obs_space, action_space=act_space
    )
    variables = net.init_variables(jax.random.key(0))
    path = str(tmp_path / "rn")
    serialize.save_reward_net(path, net, variables)
    net2, variables2 = serialize.load_reward_net(path)
    obs = np.random.randn(5, 4).astype(np.float32)
    acts = np.zeros(5, np.int64)
    dones = np.zeros(5)
    out1 = net.predict(variables, obs, acts, obs, dones)
    out2 = net2.predict(variables2, obs, acts, obs, dones)
    np.testing.assert_allclose(out1, out2, rtol=1e-6)


def test_shaped_roundtrip_and_unshaped_loader(tmp_path, spaces):
    obs_space, act_space = spaces
    net = reward_nets.BasicShapedRewardNet(obs_space, act_space)
    variables = net.init_variables(jax.random.key(1))
    path = str(tmp_path / "shaped")
    serialize.save_reward_net(path, net, variables)

    shaped_fn = serialize.load_reward("RewardNet_shaped", path)
    unshaped_fn = serialize.load_reward("RewardNet_unshaped", path)
    obs = np.ones((4, 4), np.float32)
    acts = np.zeros(4, np.int64)
    dones = np.zeros(4)
    r_shaped = shaped_fn(obs, acts, obs, dones)
    r_unshaped = unshaped_fn(obs, acts, obs, dones)
    assert r_shaped.shape == (4,)
    assert not np.allclose(r_shaped, r_unshaped)


def test_unshaped_loader_rejects_plain_net(tmp_path, spaces):
    obs_space, act_space = spaces
    net = reward_nets.BasicRewardNet(
        observation_space=obs_space, action_space=act_space
    )
    variables = net.init_variables(jax.random.key(0))
    path = str(tmp_path / "plain")
    serialize.save_reward_net(path, net, variables)
    with pytest.raises(TypeError, match="ShapedRewardNet"):
        serialize.load_reward("RewardNet_unshaped", path)


def test_zero_reward(spaces):
    fn = serialize.load_reward("zero", "")
    out = fn(np.zeros((3, 4)), np.zeros(3), np.zeros((3, 4)), np.zeros(3))
    np.testing.assert_array_equal(out, np.zeros(3))


def test_unknown_type_raises():
    with pytest.raises(KeyError):
        serialize.load_reward("nope", "")


def test_ensemble_roundtrip_and_std_added(tmp_path, spaces):
    obs_space, act_space = spaces
    ens = reward_nets.RewardEnsemble(
        observation_space=obs_space, action_space=act_space,
        member_cls=reward_nets.BasicRewardNet, num_members=3,
    )
    variables = ens.init_variables(jax.random.key(5))
    path = str(tmp_path / "ens")
    serialize.save_reward_net(path, ens, variables)
    fn0 = serialize.load_reward("RewardNet_std_added", path, alpha=0.0)
    fn1 = serialize.load_reward("RewardNet_std_added", path, alpha=1.0)
    obs = np.random.default_rng(0).normal(size=(4, 4)).astype(np.float32)
    acts = np.zeros(4, np.int64)
    dones = np.zeros(4)
    r0 = fn0(obs, acts, obs, dones)
    r1 = fn1(obs, acts, obs, dones)
    assert (r1 >= r0).all()
    # mean matches direct ensemble prediction
    mean, _ = ens.apply(
        variables, jnp.asarray(obs), jnp.asarray(acts), jnp.asarray(obs),
        jnp.asarray(dones), method="predict_reward_moments",
    )
    np.testing.assert_allclose(r0, np.asarray(mean), rtol=1e-5)


def test_std_added_rejects_non_ensemble(tmp_path, spaces):
    obs_space, act_space = spaces
    net = reward_nets.BasicRewardNet(
        observation_space=obs_space, action_space=act_space
    )
    path = str(tmp_path / "plain2")
    serialize.save_reward_net(path, net, net.init_variables(jax.random.key(0)))
    with pytest.raises(TypeError, match="RewardEnsemble"):
        serialize.load_reward("RewardNet_std_added", path)

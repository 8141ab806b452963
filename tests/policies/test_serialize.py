"""Policy serialization/registry tests (reference tests/policies)."""

import jax
import numpy as np
import pytest

from imitation_tpu.envs import make_vec_env
from imitation_tpu.models.policies import ActorCriticPolicy
from imitation_tpu.policies import serialize


@pytest.fixture
def venv():
    return make_vec_env("CartPole-v1", num_envs=2)


def test_save_load_roundtrip(tmp_path, venv):
    policy = ActorCriticPolicy(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
        hid_sizes=(16, 16),
    )
    variables = policy.init(jax.random.key(0))
    serialize.save_policy(str(tmp_path / "p"), policy, variables)
    p2, v2 = serialize.load_policy_from_path(str(tmp_path / "p"))
    assert p2.hid_sizes == (16, 16)
    import jax.numpy as jnp

    obs = jnp.ones((3, 4))
    d1 = policy.distribution(variables, obs)
    d2 = p2.distribution(v2, obs)
    np.testing.assert_allclose(np.asarray(d1.logits), np.asarray(d2.logits), rtol=1e-6)


@pytest.mark.parametrize("policy_type", ["random", "zero"])
def test_registry_nontrainable(venv, policy_type):
    policy, variables = serialize.load_policy(policy_type, venv)
    fn = policy.sample_fn()
    import jax.numpy as jnp

    acts, _ = fn(variables, jnp.zeros((4, 4)), jax.random.key(0))
    assert acts.shape == (4,)
    if policy_type == "zero":
        assert np.asarray(acts).sum() == 0


def test_registry_ppo_path(tmp_path, venv):
    policy = ActorCriticPolicy(
        observation_space=venv.observation_space, action_space=venv.action_space
    )
    variables = policy.init(jax.random.key(1))
    serialize.save_policy(str(tmp_path / "p"), policy, variables)
    p2, v2 = serialize.load_policy("ppo", venv, path=str(tmp_path / "p"))
    assert p2.action_space.n == 2


def test_registry_space_mismatch_raises(tmp_path):
    venv_cp = make_vec_env("CartPole-v1", num_envs=2)
    venv_pen = make_vec_env("Pendulum-v1", num_envs=2)
    policy = ActorCriticPolicy(
        observation_space=venv_cp.observation_space,
        action_space=venv_cp.action_space,
    )
    serialize.save_policy(
        str(tmp_path / "p"), policy, policy.init(jax.random.key(0))
    )
    with pytest.raises(ValueError, match="does not match"):
        serialize.load_policy("ppo", venv_pen, path=str(tmp_path / "p"))


def test_unknown_policy_type_raises(venv):
    with pytest.raises(KeyError):
        serialize.load_policy("nope", venv)


def test_save_policy_callback(tmp_path, venv):
    from types import SimpleNamespace

    policy = ActorCriticPolicy(
        observation_space=venv.observation_space, action_space=venv.action_space
    )
    variables = policy.init(jax.random.key(0))
    cb = serialize.SavePolicyCallback(str(tmp_path), policy, save_interval_updates=2)
    state = SimpleNamespace(variables=variables)
    for _ in range(4):
        cb(state)
    import os

    saved = [d for d in os.listdir(tmp_path)]
    assert len(saved) == 2  # every 2nd call


def test_policy_roundtrip_preserves_activation(tmp_path):
    """Activation must survive save/load — a tanh-for-relu swap silently
    breaks a trained policy."""
    import flax.linen as nn
    import jax
    import numpy as np

    from imitation_tpu.envs import make_vec_env
    from imitation_tpu.models.policies import ActorCriticPolicy
    from imitation_tpu.policies import serialize as policy_serialize

    venv = make_vec_env("Pendulum-v1", num_envs=2)
    policy = ActorCriticPolicy(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
        activation=nn.relu,
    )
    variables = policy.init(jax.random.key(0))
    policy_serialize.save_policy(str(tmp_path / "p"), policy, variables)
    loaded, lvars = policy_serialize.load_policy_from_path(str(tmp_path / "p"))

    obs = np.full((3, 3), 0.7, np.float32)
    d1, v1 = policy.dist_and_value(variables, obs)
    d2, v2 = loaded.dist_and_value(lvars, obs)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d1.mean), np.asarray(d2.mean), rtol=1e-6)

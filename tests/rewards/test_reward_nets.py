"""Reward net tests: shapes, wrapper semantics, ensemble, normalization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imitation_tpu.envs.base import Space
from imitation_tpu.models import networks
from imitation_tpu.rewards import reward_nets

OBS = Space.box(-1, 1, (4,))
ACT_D = Space.discrete(3)
ACT_C = Space.box(-1, 1, (2,))


def batch(space_obs, space_act, n=8, key=0):
    k = jax.random.key(key)
    k1, k2, k3 = jax.random.split(k, 3)
    obs = jax.random.normal(k1, (n,) + space_obs.shape)
    if space_act.is_discrete:
        acts = jax.random.randint(k2, (n,), 0, space_act.n)
    else:
        acts = jax.random.normal(k2, (n,) + space_act.shape)
    next_obs = jax.random.normal(k3, (n,) + space_obs.shape)
    dones = (jnp.arange(n) % 3 == 0).astype(jnp.float32)
    return obs, acts, next_obs, dones


@pytest.mark.parametrize("act_space", [ACT_D, ACT_C])
@pytest.mark.parametrize(
    "flags",
    [
        dict(use_state=True, use_action=True),
        dict(use_state=True, use_action=False),
        dict(use_state=True, use_action=True, use_next_state=True, use_done=True),
    ],
)
def test_basic_reward_net_shapes(act_space, flags):
    net = reward_nets.BasicRewardNet(
        observation_space=OBS, action_space=act_space, **flags
    )
    variables = net.init_variables(jax.random.key(0))
    args = batch(OBS, act_space)
    out = net.apply(variables, *args)
    assert out.shape == (8,)
    assert np.isfinite(np.asarray(out)).all()


def test_predict_host_api():
    net = reward_nets.BasicRewardNet(observation_space=OBS, action_space=ACT_D)
    variables = net.init_variables(jax.random.key(0))
    obs = np.zeros((5, 4), np.float32)
    acts = np.zeros((5,), np.int64)
    out = net.predict(variables, obs, acts, obs, np.zeros(5))
    assert isinstance(out, np.ndarray) and out.shape == (5,)


def test_shaped_reward_terminal_potential_zeroed():
    """At done steps shaping contributes only -phi(s): next potential zeroed."""
    net = reward_nets.BasicShapedRewardNet(OBS, ACT_C, discount_factor=0.9)
    variables = net.init_variables(jax.random.key(1))
    obs, acts, next_obs, _ = batch(OBS, ACT_C)
    ones = jnp.ones(8)
    zeros = jnp.zeros(8)
    r_done = net.apply(variables, obs, acts, next_obs, ones)
    r_not = net.apply(variables, obs, acts, next_obs, zeros)
    base = net.apply(variables, obs, acts, next_obs, zeros, method="base_forward")
    phi_s = np.asarray(r_done - base)  # r_done = base - phi(s) => -phi(s)
    new_pot = np.asarray(r_not - r_done) / 0.9  # gamma*phi(s')
    # shaping differs between done and not-done unless potential is constant
    assert not np.allclose(new_pot, 0.0)
    # base_forward strips shaping entirely
    assert not np.allclose(np.asarray(base), np.asarray(r_not))


def test_normalized_reward_net():
    net = reward_nets.NormalizedRewardNet(
        observation_space=OBS,
        action_space=ACT_C,
        base=reward_nets.BasicRewardNet(
            observation_space=OBS, action_space=ACT_C, name="base"
        ),
    )
    variables = net.init_variables(jax.random.key(2))
    args = batch(OBS, ACT_C, n=64)
    raw = net.apply(variables, *args)  # training path: unnormalized
    # inference path with stats update
    out, mutated = net.apply(
        variables, *args, method="predict_processed", update_stats=True,
        mutable=["stats"],
    )
    variables = {**variables, "stats": mutated["stats"]}
    out2 = net.apply(
        variables, *args, method="predict_processed", update_stats=False
    )
    # after stats adoption, outputs are standardized
    assert abs(float(out2.mean())) < 0.2
    assert 0.5 < float(out2.std()) < 2.0
    # training path unchanged by normalization
    np.testing.assert_allclose(np.asarray(raw), np.asarray(net.apply(variables, *args)))


def test_ensemble_moments_and_wrapper():
    ens = reward_nets.RewardEnsemble(
        observation_space=OBS, action_space=ACT_C,
        member_cls=reward_nets.BasicRewardNet, num_members=3,
    )
    variables = ens.init_variables(jax.random.key(3))
    args = batch(OBS, ACT_C)
    all_r = ens.apply(variables, *args)
    assert all_r.shape == (3, 8)
    mean, var = ens.apply(variables, *args, method="predict_reward_moments")
    assert mean.shape == (8,) and var.shape == (8,)
    # members differ (independent init) => positive variance
    assert (np.asarray(var) > 0).all()
    np.testing.assert_allclose(np.asarray(mean), np.asarray(all_r).mean(0), rtol=1e-5)

    wrapper = reward_nets.AddSTDRewardWrapper(
        observation_space=OBS, action_space=ACT_C, base=ens, default_alpha=0.0
    )
    # share ensemble params under the wrapper's scope
    wvars = wrapper.init_variables(jax.random.key(3))
    out0 = wrapper.apply(wvars, *args, method="predict_processed")
    out1 = wrapper.apply(wvars, *args, method="predict_processed", alpha=1.0)
    outm = wrapper.apply(wvars, *args, method="predict_processed", alpha=-1.0)
    assert (np.asarray(out1) >= np.asarray(out0)).all()
    assert (np.asarray(outm) <= np.asarray(out0)).all()


def test_ensemble_too_few_members_raises():
    ens = reward_nets.RewardEnsemble(
        observation_space=OBS, action_space=ACT_C,
        member_cls=reward_nets.BasicRewardNet, num_members=1,
    )
    with pytest.raises(ValueError, match="at least 2"):
        ens.init_variables(jax.random.key(0))


def test_cnn_reward_net():
    obs_space = Space.box(0, 255, (8, 8, 3), dtype=np.uint8)
    act_space = Space.discrete(4)
    net = reward_nets.CnnRewardNet(
        observation_space=obs_space, action_space=act_space,
        hid_channels=(8, 8), use_done=True,
    )
    key = jax.random.key(0)
    obs = jax.random.randint(key, (5, 8, 8, 3), 0, 255).astype(jnp.uint8)
    acts = jnp.zeros((5,), jnp.int32)
    dones = jnp.zeros((5,))
    variables = net.init(key, obs, acts, obs, dones)
    out = net.apply(variables, obs, acts, obs, dones)
    assert out.shape == (5,)
    # done flag selects the other half of outputs
    out_done = net.apply(variables, obs, acts, obs, jnp.ones((5,)))
    assert not np.allclose(np.asarray(out), np.asarray(out_done))


def test_cnn_continuous_action_raises():
    obs_space = Space.box(0, 255, (8, 8, 3), dtype=np.uint8)
    net = reward_nets.CnnRewardNet(
        observation_space=obs_space, action_space=ACT_C, hid_channels=(4,),
    )
    with pytest.raises(ValueError, match="discrete"):
        net.init_variables(jax.random.key(0))


def test_basic_reward_net_input_norm():
    """normalize_input=RunningNorm equivalent (reference tuned adversarial
    configs set net_kwargs.normalize_input_layer=RunningNorm)."""
    import jax
    import jax.numpy as jnp

    from imitation_tpu.envs import make_vec_env
    from imitation_tpu.rewards.reward_nets import BasicRewardNet

    venv = make_vec_env("Pendulum-v1", num_envs=2)
    net = BasicRewardNet(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
        normalize_input=True,
    )
    variables = net.init_variables(jax.random.key(0))
    assert "stats" in variables

    obs = jnp.ones((4, 3)) * 5.0
    acts = jnp.ones((4, 1))
    dones = jnp.zeros((4,))
    r1 = net.apply(variables, obs, acts, obs, dones)
    # read-only forward: repeated calls identical
    r2 = net.apply(variables, obs, acts, obs, dones)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))

    # folding shifted data into the stats changes the output
    _, mutated = net.apply(
        variables, obs, acts, obs, dones, update_stats=True, mutable=["stats"]
    )
    v2 = {**variables, **mutated}
    r3 = net.apply(v2, obs, acts, obs, dones)
    assert not np.allclose(np.asarray(r1), np.asarray(r3))


def test_gail_with_input_norm_smoke():
    import jax

    from imitation_tpu.algorithms.adversarial.gail import GAIL
    from imitation_tpu.envs import make_vec_env
    from imitation_tpu.rewards.reward_nets import BasicRewardNet
    from imitation_tpu.rl.ppo import PPOConfig
    from imitation_tpu.testing import experts

    venv = make_vec_env("CartPole-v1", num_envs=4, max_episode_steps=20)
    demos = experts.generate_expert_trajectories("CartPole-v1", venv, min_episodes=2)
    net = BasicRewardNet(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
        normalize_input=True,
    )
    gail = GAIL(
        demonstrations=demos,
        demo_batch_size=16,
        venv=venv,
        reward_net=net,
        gen_config=PPOConfig(n_steps=8, n_minibatches=2, n_epochs=1),
        allow_variable_horizon=True,
        seed=0,
    )
    before = np.asarray(
        jax.device_get(gail.disc_state.variables["stats"]["input_norm"]["count"])
    )
    gail.train(2 * gail.gen_train_timesteps)
    after = np.asarray(
        jax.device_get(gail.disc_state.variables["stats"]["input_norm"]["count"])
    )
    assert after > before  # disc steps folded batches into the input norm

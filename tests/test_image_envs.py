"""Real image env (Box2D CarRacing, 96x96x3 RGB) through the gym bridge.

Covers the image end-to-end path the reference exercises via Atari
(reference tutorials/8a + CnnRewardNet tests): a CnnPolicy-style policy and
CnnRewardNet trained on actual rendered frames. ALE isn't in this image, so
the discrete-action CarRacing-v3 stands in for Pong.
"""

import jax
import numpy as np
import pytest

from imitation_tpu.envs import make_vec_env

pytestmark = pytest.mark.filterwarnings("ignore::DeprecationWarning")


@pytest.fixture(scope="module")
def car_venv():
    try:
        venv = make_vec_env(
            "CarRacing-v3", num_envs=2, max_episode_steps=8, continuous=False
        )
    except Exception as e:  # pragma: no cover - env dep missing
        pytest.skip(f"CarRacing unavailable: {e}")
    return venv


def _random_image_trajs(venv, n=2, seed=0):
    from imitation_tpu.data import rollout as rmod
    from imitation_tpu.models.policies import RandomPolicy

    pol = RandomPolicy(venv.observation_space, venv.action_space)
    return rmod.generate_trajectories(
        pol.sample_fn(), {}, venv, rmod.make_min_episodes(n), rng=seed
    )


def test_image_env_spaces(car_venv):
    assert car_venv.observation_space.shape == (96, 96, 3)
    assert car_venv.action_space.is_discrete


def test_bc_cnn_policy_on_image_env(car_venv):
    """BC with the NatureCNN policy trains on real RGB frames."""
    from imitation_tpu.algorithms.bc import BC

    from imitation_tpu.models.policies import ActorCriticPolicy

    trajs = _random_image_trajs(car_venv)
    policy = ActorCriticPolicy(
        observation_space=car_venv.observation_space,
        action_space=car_venv.action_space,
        features="nature_cnn",
    )
    bc = BC(
        observation_space=car_venv.observation_space,
        action_space=car_venv.action_space,
        demonstrations=trajs,
        rng=0,
        batch_size=8,
        policy=policy,
        allow_variable_horizon=True,
    )
    bc.train(n_batches=2)
    # policy acts on a fresh frame batch
    obs = np.zeros((2, 96, 96, 3), np.float32)
    acts, _ = bc.policy.sample_fn()(bc.state.variables, obs, jax.random.key(0))
    assert acts.shape == (2,)


def test_rlhf_cnn_reward_on_image_env(car_venv):
    """Preference comparisons with CnnRewardNet on real RGB frames
    (the reference's Atari RLHF configuration, scaled down)."""
    from imitation_tpu.algorithms import preference_comparisons as pc
    from imitation_tpu.rewards.reward_nets import CnnRewardNet

    trajs = _random_image_trajs(car_venv, n=3)
    net = CnnRewardNet(
        observation_space=car_venv.observation_space,
        action_space=car_venv.action_space,
        hid_channels=(8, 8),
    )
    variables = net.init_variables(jax.random.key(0))
    model = pc.PreferenceModel(net)
    trainer = pc.BasicRewardTrainer(model, epochs=1, batch_size=4, lr=1e-3)
    trainer.attach(variables)
    frag = pc.RandomFragmenter(rng=0, warning_threshold=0)
    pairs = frag(trajs, fragment_length=4, num_pairs=4)
    gatherer = pc.SyntheticGatherer(rng=np.random.default_rng(0))
    ds = pc.PreferenceDataset()
    ds.push(pairs, gatherer(pairs))
    loss0 = trainer._eval_loss(trainer.variables, ds.as_batch())
    trainer.train(ds)
    loss1 = trainer._eval_loss(trainer.variables, ds.as_batch())
    assert np.isfinite(loss0) and np.isfinite(loss1)


def test_train_rl_cnn_policy_script(tmp_path, car_venv):
    """train_rl with the cnn_policy named config on a real image env
    (reference test_train_rl_cnn_policy)."""
    del car_venv  # ensures CarRacing availability (skips otherwise)
    from imitation_tpu.scripts import train_rl

    result = train_rl.ex.run_cli([
        "with", "fast", "cnn_policy", "env_name=CarRacing-v3",
        "env_make_kwargs={'continuous': False}",
        "total_timesteps=64", "num_envs=2", "max_episode_steps=8",
        "n_episodes_eval=1", "rollout_save_n_episodes=1",
        "rl={'n_steps': 8, 'batch_size': 8, 'n_epochs': 1}",
        f"log_root={tmp_path}",
    ])
    assert np.isfinite(result["return_mean"])

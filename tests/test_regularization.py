"""Regularization tests (reference tests/test_regularization.py, 528 LoC)."""

import jax.numpy as jnp
import numpy as np
import pytest

from imitation_tpu.algorithms.regularization import (
    IntervalParamScaler,
    LpRegularizer,
    Regularizer,
    WeightDecayRegularizer,
)


class TestIntervalParamScaler:
    def test_scales_up_when_overfitting(self):
        scaler = IntervalParamScaler(0.5, (0.5, 1.5))
        # val/train = 4 > 1.5 -> increase regularization (lambda / factor)
        assert scaler(1.0, 1.0, 4.0) == 2.0

    def test_scales_down_when_underfitting(self):
        scaler = IntervalParamScaler(0.5, (0.5, 1.5))
        assert scaler(1.0, 4.0, 1.0) == 0.5

    def test_within_interval_unchanged(self):
        scaler = IntervalParamScaler(0.5, (0.5, 1.5))
        assert scaler(1.0, 1.0, 1.0) == 1.0

    def test_validation(self):
        with pytest.raises(ValueError):
            IntervalParamScaler(1.5, (0.5, 1.5))
        with pytest.raises(ValueError):
            IntervalParamScaler(0.5, (1.5, 0.5))
        with pytest.raises(ValueError):
            IntervalParamScaler(0.5, (0.5,))
        scaler = IntervalParamScaler(0.5, (0.5, 1.5))
        with pytest.raises(ValueError):
            scaler(-1.0, 1.0, 1.0)
        with pytest.raises(ValueError):
            scaler(1.0, -1.0, 1.0)


class TestRegularizerValidation:
    def test_updater_without_split_raises(self):
        scaler = IntervalParamScaler(0.5, (0.5, 1.5))
        with pytest.raises(ValueError, match="val_split"):
            LpRegularizer(1.0, lambda_updater=scaler, val_split=None, p=2)

    def test_split_without_updater_raises(self):
        with pytest.raises(ValueError, match="val_split"):
            LpRegularizer(1.0, lambda_updater=None, val_split=0.2, p=2)

    def test_zero_lambda_without_updater_raises(self):
        with pytest.raises(ValueError, match="non-zero"):
            LpRegularizer(0.0, p=2)

    def test_bad_val_split_raises(self):
        scaler = IntervalParamScaler(0.5, (0.5, 1.5))
        with pytest.raises(ValueError):
            LpRegularizer(1.0, lambda_updater=scaler, val_split=1.5, p=2)

    def test_bad_p_raises(self):
        with pytest.raises(ValueError, match="positive integer"):
            LpRegularizer(1.0, p=0)


def test_lp_penalty_values():
    params = {"w": jnp.asarray([3.0, -4.0])}
    l2 = LpRegularizer(1.0, p=2)
    assert float(l2.loss_penalty(params)) == 25.0
    l1 = LpRegularizer(1.0, p=1)
    assert float(l1.loss_penalty(params)) == 7.0


def test_weight_decay_penalty():
    params = {"w": jnp.asarray([2.0, 2.0])}
    wd = WeightDecayRegularizer(1.0)
    assert float(wd.loss_penalty(params)) == 4.0


def test_update_params_scales_lambda():
    scaler = IntervalParamScaler(0.5, (0.5, 1.5))
    reg = LpRegularizer(1.0, lambda_updater=scaler, val_split=0.2, p=2)
    reg.update_params(train_loss=1.0, val_loss=10.0)
    assert reg.lambda_ == 2.0


def test_factory():
    factory = LpRegularizer.create(initial_lambda=0.5, p=2)
    reg = factory(optimizer=None, logger=None)
    assert isinstance(reg, LpRegularizer)
    assert reg.lambda_ == 0.5


def test_reward_trainer_with_regularizer():
    """End-to-end: BasicRewardTrainer with Lp regularizer + interval scaler."""
    from imitation_tpu.algorithms import preference_comparisons as pc
    from imitation_tpu.envs import make_vec_env
    from imitation_tpu.rewards.reward_nets import BasicRewardNet
    from imitation_tpu.testing import experts
    import jax

    venv = make_vec_env("Pendulum-v1", num_envs=4)
    trajs = experts.generate_expert_trajectories("Pendulum-v1", venv, min_episodes=4)
    net = BasicRewardNet(
        observation_space=venv.observation_space, action_space=venv.action_space
    )
    variables = net.init_variables(jax.random.key(0))
    model = pc.PreferenceModel(net)
    factory = LpRegularizer.create(
        initial_lambda=0.1, p=2,
        lambda_updater=IntervalParamScaler(0.5, (0.5, 1.5)),
        val_split=0.25,
    )
    trainer = pc.BasicRewardTrainer(
        model, epochs=2, batch_size=4, regularizer_factory=factory
    )
    trainer.attach(variables)
    frag = pc.RandomFragmenter(rng=0, warning_threshold=0)
    pairs = frag(trajs, fragment_length=8, num_pairs=16)
    gatherer = pc.SyntheticGatherer(rng=np.random.default_rng(0))
    ds = pc.PreferenceDataset()
    ds.push(pairs, gatherer(pairs))
    trainer.train(ds)  # exercises penalty + lambda update path
    assert trainer.regularizer.lambda_ > 0

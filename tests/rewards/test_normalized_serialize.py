"""NormalizedRewardNet round-trip + wrapper-structure validation.

Reference behaviors: tests/rewards/test_serialize.py
(``test_cant_load_unnorm_as_norm``, ``test_strip_wrappers_basic/complex``,
``test_validate_wrapper_structure``) and reference rewards/serialize.py
:115-170 (wrapper-prefix validation and stripping).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imitation_tpu.envs.base import Space
from imitation_tpu.models.networks import EMANorm, RunningNorm
from imitation_tpu.rewards import serialize as rs
from imitation_tpu.rewards.reward_nets import (
    BasicRewardNet,
    BasicShapedRewardNet,
    NormalizedRewardNet,
    RewardEnsemble,
)

OBS = Space.box(-1, 1, (3,))
ACT = Space.box(-1, 1, (2,))


def batch(n=4):
    return (
        np.ones((n, 3), np.float32),
        np.ones((n, 2), np.float32),
        np.ones((n, 3), np.float32),
        np.zeros((n,), np.float32),
    )


def make_normalized(norm_cls=RunningNorm, key=0):
    net = NormalizedRewardNet(
        observation_space=OBS,
        action_space=ACT,
        base=BasicRewardNet(observation_space=OBS, action_space=ACT),
        normalize_cls=norm_cls,
    )
    return net, net.init_variables(jax.random.key(key))


class TestNormalizedNet:
    def test_init_contains_normalizer_stats(self):
        net, v = make_normalized()
        assert "stats" in v
        flat = jax.tree_util.tree_leaves_with_path(v["stats"])
        assert any("normalizer" in jax.tree_util.keystr(p) for p, _ in flat)

    def test_forward_is_raw_base(self):
        """Training path ignores normalization (PredictProcessedWrapper rule,
        reference reward_nets.py:303-353)."""
        net, v = make_normalized()
        o, a, no, d = batch()
        raw = net.apply(v, o, a, no, d)
        base_direct = net.apply(v, o, a, no, d, method=lambda m, *args: m.base(*args))
        np.testing.assert_allclose(np.asarray(raw), np.asarray(base_direct))

    def test_predict_processed_standardizes(self):
        net, v = make_normalized()
        o, a, no, d = batch(64)
        o = o * np.random.default_rng(0).normal(size=o.shape).astype(np.float32)
        _, mut = net.apply(
            v, o, a, no, d, True, method="predict_processed", mutable=["stats"]
        )
        v2 = {**v, "stats": mut["stats"]}
        out = net.apply(v2, o, a, no, d, False, method="predict_processed")
        out = np.asarray(out)
        # After folding this batch, standardized outputs have ~zero mean.
        assert abs(out.mean()) < 0.2

    def test_ema_variant(self):
        net, v = make_normalized(EMANorm)
        o, a, no, d = batch()
        out = net.apply(v, o, a, no, d, False, method="predict_processed")
        assert np.isfinite(np.asarray(out)).all()


class TestSerializeRoundtrip:
    def test_normalized_roundtrip(self, tmp_path):
        net, v = make_normalized()
        o, a, no, d = batch()
        raw = np.asarray(net.apply(v, o, a, no, d))
        rs.save_reward_net(str(tmp_path), net, v)
        net2, v2 = rs.load_reward_net(str(tmp_path))
        assert isinstance(net2, NormalizedRewardNet)
        np.testing.assert_allclose(raw, np.asarray(net2.apply(v2, o, a, no, d)), rtol=1e-6)

    def test_load_normalized_frozen_stats(self, tmp_path):
        net, v = make_normalized()
        rs.save_reward_net(str(tmp_path), net, v)
        fn = rs.load_reward("RewardNet_normalized", str(tmp_path))
        o, a, no, d = batch()
        r1 = fn(o, a, no, d)
        r2 = fn(o, a, no, d)
        # frozen stats: identical outputs on repeat calls
        np.testing.assert_allclose(r1, r2)

    def test_load_unnormalized_strips_wrapper(self, tmp_path):
        net, v = make_normalized()
        o, a, no, d = batch()
        raw = np.asarray(net.apply(v, o, a, no, d))
        rs.save_reward_net(str(tmp_path), net, v)
        fn = rs.load_reward("RewardNet_unnormalized", str(tmp_path))
        np.testing.assert_allclose(fn(o, a, no, d), raw, rtol=1e-5)

    def test_normalized_over_shaped_unshaped_path(self, tmp_path):
        """Strip Normalized then Shaped: transfer-eval reward through both
        wrappers (reference test_strip_wrappers_complex)."""
        shaped = BasicShapedRewardNet(OBS, ACT)
        net = NormalizedRewardNet(
            observation_space=OBS, action_space=ACT, base=shaped,
            normalize_cls=RunningNorm,
        )
        v = net.init_variables(jax.random.key(3))
        rs.save_reward_net(str(tmp_path), net, v)
        fn = rs.load_reward("RewardNet_unshaped", str(tmp_path))
        o, a, no, d = batch()
        expected = net.apply(
            v, o, a, no, d, method=lambda m, *args: m.base.base_forward(*args)
        )
        np.testing.assert_allclose(fn(o, a, no, d), np.asarray(expected), rtol=1e-5)
        # shaped path includes potential shaping
        fn_shaped = rs.load_reward("RewardNet_shaped", str(tmp_path))
        expected_shaped = net.apply(
            v, o, a, no, d, method=lambda m, *args: m.base(*args)
        )
        np.testing.assert_allclose(
            fn_shaped(o, a, no, d), np.asarray(expected_shaped), rtol=1e-5
        )


class TestValidation:
    def test_cant_load_unnorm_as_norm(self, tmp_path):
        basic = BasicRewardNet(observation_space=OBS, action_space=ACT)
        rs.save_reward_net(str(tmp_path), basic, basic.init_variables(jax.random.key(1)))
        with pytest.raises(TypeError, match="RewardNet_normalized"):
            rs.load_reward("RewardNet_normalized", str(tmp_path))

    def test_cant_load_basic_as_shaped(self, tmp_path):
        basic = BasicRewardNet(observation_space=OBS, action_space=ACT)
        rs.save_reward_net(str(tmp_path), basic, basic.init_variables(jax.random.key(1)))
        for t in ("RewardNet_shaped", "RewardNet_unshaped"):
            with pytest.raises(TypeError, match=t):
                rs.load_reward(t, str(tmp_path))

    def test_std_added_requires_ensemble(self, tmp_path):
        basic = BasicRewardNet(observation_space=OBS, action_space=ACT)
        rs.save_reward_net(str(tmp_path), basic, basic.init_variables(jax.random.key(1)))
        with pytest.raises(TypeError, match="RewardNet_std_added"):
            rs.load_reward("RewardNet_std_added", str(tmp_path))

    def test_unknown_reward_type(self, tmp_path):
        basic = BasicRewardNet(observation_space=OBS, action_space=ACT)
        rs.save_reward_net(str(tmp_path), basic, basic.init_variables(jax.random.key(1)))
        with pytest.raises(ValueError, match="unknown reward type"):
            rs.load_reward_apply("RewardNet_bogus", str(tmp_path))

    def test_std_added_alpha_passed_through(self, tmp_path):
        ens = RewardEnsemble(
            observation_space=OBS, action_space=ACT,
            member_cls=BasicRewardNet, num_members=3,
        )
        v = ens.init_variables(jax.random.key(2))
        rs.save_reward_net(str(tmp_path), ens, v)
        o, a, no, d = batch()
        r0 = rs.load_reward("RewardNet_std_added", str(tmp_path), alpha=0.0)(o, a, no, d)
        r2 = rs.load_reward("RewardNet_std_added", str(tmp_path), alpha=2.0)(o, a, no, d)
        mean, var = ens.apply(v, jnp.asarray(o), jnp.asarray(a), jnp.asarray(no),
                              jnp.asarray(d), method="predict_reward_moments")
        np.testing.assert_allclose(r0, np.asarray(mean), rtol=1e-5)
        np.testing.assert_allclose(
            r2, np.asarray(mean + 2.0 * jnp.sqrt(var)), rtol=1e-5
        )


class TestNormalizedMemberEnsemble:
    """Member-level output normalization (reference reward_ensemble config:
    ensemble_member_config.normalize_output_layer = RunningNorm)."""

    def make(self, key=0):
        ens = RewardEnsemble(
            observation_space=OBS, action_space=ACT,
            member_cls=BasicRewardNet, num_members=3,
            member_normalize_cls=RunningNorm,
        )
        return ens, ens.init_variables(jax.random.key(key))

    def test_init_has_per_member_stats(self):
        ens, v = self.make()
        assert "stats" in v
        leaves = jax.tree_util.tree_leaves_with_path(v["stats"])
        norm = [x for p, x in leaves if "normalizer" in jax.tree_util.keystr(p)]
        assert norm and norm[0].shape[0] == 3  # member axis

    def test_training_forward_is_raw(self):
        ens, v = self.make()
        o, a, no, d = batch()
        raw = ens.apply(v, o, a, no, d)
        assert raw.shape == (3, 4)

    def test_predict_processed_uses_member_stats(self):
        ens, v = self.make()
        o, a, no, d = batch(32)
        _, mut = ens.apply(
            v, o, a, no, d, True, method="predict_processed", mutable=["stats"]
        )
        v2 = {**v, "stats": mut["stats"]}
        out = ens.apply(v2, o, a, no, d, False, method="predict_processed")
        # per-member standardization then mean: near zero on the folded batch
        assert abs(float(np.asarray(out).mean())) < 0.3
        # raw outputs unchanged by stats
        np.testing.assert_allclose(
            np.asarray(ens.apply(v, o, a, no, d)),
            np.asarray(ens.apply(v2, o, a, no, d)),
        )

    def test_serialize_roundtrip(self, tmp_path):
        ens, v = self.make()
        o, a, no, d = batch()
        raw = np.asarray(ens.apply(v, o, a, no, d))
        rs.save_reward_net(str(tmp_path), ens, v)
        ens2, v2 = rs.load_reward_net(str(tmp_path))
        assert ens2.member_normalize_cls is RunningNorm
        np.testing.assert_allclose(raw, np.asarray(ens2.apply(v2, o, a, no, d)), rtol=1e-6)

    def test_member_training_path_param_tree_matches(self):
        """EnsembleTrainer's standalone member reconstruction applies the
        vmapped member params without tree mismatch."""
        from imitation_tpu.algorithms import preference_comparisons as pc

        ens, v = self.make()
        model = pc.PreferenceModel(ens)
        obs = np.zeros((2, 2, 6, 3), np.float32)  # [N, 2, L+1, obs]
        acts = np.zeros((2, 2, 5, 2), np.float32)
        dones = np.zeros((2, 2, 5), np.float32)
        b = pc.FragmentBatch(
            obs=jnp.asarray(np.repeat(obs[None], 3, 0)),
            acts=jnp.asarray(np.repeat(acts[None], 3, 0)),
            dones=jnp.asarray(np.repeat(dones[None], 3, 0)),
            rews_gt=jnp.zeros((3, 2, 2, 5)),
            prefs=jnp.zeros((3, 2)),
        )
        rews = model.member_fragment_rewards(v, b)
        assert rews.shape == (3, 2, 2, 5)

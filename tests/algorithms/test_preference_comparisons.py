"""Preference comparisons tests.

Modeled on reference tests/algorithms/test_preference_comparisons.py:
fragmenter behavior, synthetic gatherer math, dataset FIFO, preference-model
probabilities, trainer mechanics, full-loop smoke + learning.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imitation_tpu.algorithms import preference_comparisons as pc
from imitation_tpu.data import rollout
from imitation_tpu.envs import make_vec_env
from imitation_tpu.models.policies import ActorCriticPolicy
from imitation_tpu.rewards.reward_nets import BasicRewardNet, RewardEnsemble
from imitation_tpu.rl.ppo import PPO, PPOConfig
from imitation_tpu.testing import experts
from imitation_tpu.data import types


@pytest.fixture(scope="module")
def pendulum_trajs():
    venv = make_vec_env("Pendulum-v1", num_envs=8)
    return experts.generate_expert_trajectories("Pendulum-v1", venv, min_episodes=8)


@pytest.fixture
def reward_net():
    venv = make_vec_env("Pendulum-v1", num_envs=2)
    return BasicRewardNet(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
    )


def test_random_fragmenter_lengths(pendulum_trajs):
    frag = pc.RandomFragmenter(rng=0, warning_threshold=0)
    pairs = frag(pendulum_trajs, fragment_length=20, num_pairs=5)
    assert len(pairs) == 5
    for f1, f2 in pairs:
        assert len(f1) == 20 and len(f2) == 20
        assert f1.obs.shape == (21, 3)


def test_random_fragmenter_too_short_raises(pendulum_trajs):
    frag = pc.RandomFragmenter(rng=0)
    with pytest.raises(ValueError, match="long enough"):
        frag(pendulum_trajs, fragment_length=10_000, num_pairs=1)


def test_synthetic_gatherer_deterministic(pendulum_trajs):
    frag = pc.RandomFragmenter(rng=0, warning_threshold=0)
    pairs = frag(pendulum_trajs, fragment_length=10, num_pairs=4)
    gatherer = pc.SyntheticGatherer(temperature=0, sample=False)
    prefs = gatherer(pairs)
    for (f1, f2), p in zip(pairs, prefs):
        expected = (np.sign(f1.rews.sum() - f2.rews.sum()) + 1) / 2
        assert p == expected


def test_synthetic_gatherer_sample_requires_rng():
    with pytest.raises(ValueError, match="rng"):
        pc.SyntheticGatherer(sample=True, rng=None)


def test_preference_dataset_fifo(pendulum_trajs):
    frag = pc.RandomFragmenter(rng=0, warning_threshold=0)
    pairs = frag(pendulum_trajs, fragment_length=5, num_pairs=6)
    ds = pc.PreferenceDataset(max_size=4)
    ds.push(pairs[:3], np.ones(3, np.float32))
    assert len(ds) == 3
    ds.push(pairs[3:], np.zeros(3, np.float32))
    assert len(ds) == 4  # FIFO evicted the 2 oldest
    np.testing.assert_array_equal(ds.preferences, [1, 0, 0, 0])


def test_preference_dataset_validation(pendulum_trajs):
    frag = pc.RandomFragmenter(rng=0, warning_threshold=0)
    pairs = frag(pendulum_trajs, fragment_length=5, num_pairs=2)
    ds = pc.PreferenceDataset()
    with pytest.raises(ValueError, match="shape"):
        ds.push(pairs, np.ones(3, np.float32))
    with pytest.raises(ValueError, match="dtype"):
        ds.push(pairs, np.ones(2, np.float64))


def test_preference_model_prob_sign(reward_net, pendulum_trajs):
    """Fragment with higher predicted return gets probability > 0.5."""
    variables = reward_net.init_variables(jax.random.key(0))
    model = pc.PreferenceModel(reward_net)
    frag = pc.RandomFragmenter(rng=0, warning_threshold=0)
    pairs = frag(pendulum_trajs, fragment_length=8, num_pairs=6)
    batch = pc.FragmentBatch.from_pairs(pairs, np.zeros(6, np.float32))
    rews = model.fragment_rewards(variables, batch)
    assert rews.shape == (6, 2, 8)
    probs = model.probability_from_rewards(rews)
    returns = np.asarray(rews.sum(-1))
    expected_first_better = returns[:, 0] > returns[:, 1]
    np.testing.assert_array_equal(np.asarray(probs) > 0.5, expected_first_better)


def test_preference_model_noise_prob(reward_net, pendulum_trajs):
    variables = reward_net.init_variables(jax.random.key(0))
    model = pc.PreferenceModel(reward_net, noise_prob=1.0)
    frag = pc.RandomFragmenter(rng=0, warning_threshold=0)
    pairs = frag(pendulum_trajs, fragment_length=8, num_pairs=3)
    batch = pc.FragmentBatch.from_pairs(pairs, np.zeros(3, np.float32))
    probs = model(variables, batch)
    np.testing.assert_allclose(np.asarray(probs), 0.5)


def test_basic_reward_trainer_reduces_loss(reward_net, pendulum_trajs):
    variables = reward_net.init_variables(jax.random.key(0))
    model = pc.PreferenceModel(reward_net)
    trainer = pc.BasicRewardTrainer(model, epochs=5, batch_size=8, lr=1e-2)
    trainer.attach(variables)
    frag = pc.RandomFragmenter(rng=0, warning_threshold=0)
    pairs = frag(pendulum_trajs, fragment_length=10, num_pairs=16)
    gatherer = pc.SyntheticGatherer(rng=np.random.default_rng(0))
    ds = pc.PreferenceDataset()
    ds.push(pairs, gatherer(pairs))
    batch = ds.as_batch()
    loss0 = trainer._eval_loss(trainer.variables, batch)
    trainer.train(ds)
    loss1 = trainer._eval_loss(trainer.variables, batch)
    assert loss1 < loss0


def test_ensemble_trainer_and_active_selection(pendulum_trajs):
    venv = make_vec_env("Pendulum-v1", num_envs=2)
    ens = RewardEnsemble(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
        member_cls=BasicRewardNet,
        num_members=3,
    )
    variables = ens.init_variables(jax.random.key(0))
    model = pc.PreferenceModel(ens)
    trainer = pc.EnsembleTrainer(model, epochs=2, batch_size=8)
    trainer.attach(variables)
    frag = pc.RandomFragmenter(rng=0, warning_threshold=0)
    active = pc.ActiveSelectionFragmenter(
        preference_model=model,
        base_fragmenter=frag,
        fragment_sample_factor=3.0,
        uncertainty_on="probability",
    )
    active.variables = variables
    pairs = active(pendulum_trajs, fragment_length=8, num_pairs=4)
    assert len(pairs) == 4
    gatherer = pc.SyntheticGatherer(rng=np.random.default_rng(0))
    ds = pc.PreferenceDataset()
    ds.push(pairs, gatherer(pairs))
    trainer.train(ds)  # no crash; params updated


def test_active_selection_requires_ensemble(reward_net):
    model = pc.PreferenceModel(reward_net)
    with pytest.raises(ValueError, match="ensemble"):
        pc.ActiveSelectionFragmenter(
            preference_model=model,
            base_fragmenter=pc.RandomFragmenter(rng=0),
            fragment_sample_factor=2.0,
        )


def test_query_schedule_oric_sums():
    from imitation_tpu.util.util import oric

    probs = np.array([0.3, 0.3, 0.4])
    shares = oric(probs * 10)
    assert shares.sum() == 10


def test_trajectory_dataset_sample(pendulum_trajs):
    ds = pc.TrajectoryDataset(pendulum_trajs, rng=0)
    out = ds.sample(300)
    assert sum(len(t) for t in out) >= 300
    with pytest.raises(RuntimeError, match="available"):
        ds.sample(10**9)


@pytest.mark.slow
def test_full_loop_smoke(pendulum_trajs):
    venv = make_vec_env("Pendulum-v1", num_envs=4)
    reward_net = BasicRewardNet(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
    )
    policy = ActorCriticPolicy(
        observation_space=venv.observation_space, action_space=venv.action_space
    )
    ppo = PPO(venv, policy, PPOConfig(n_steps=32, n_minibatches=4, n_epochs=2))
    agent_trainer = pc.AgentTrainer(ppo, reward_net, venv, rng=0, exploration_frac=0.1)
    main = pc.PreferenceComparisons(
        agent_trainer,
        reward_net,
        num_iterations=2,
        fragment_length=10,
        comparison_queue_size=60,
        initial_epoch_multiplier=2,
        rng=0,
    )
    result = main.train(total_timesteps=512, total_comparisons=30)
    assert result["reward_loss"] is not None
    assert np.isfinite(result["reward_loss"])
    assert len(main.dataset) > 0
    # reward model learned something about preferences on its own data
    assert result["reward_accuracy"] is None or result["reward_accuracy"] >= 0.4


@pytest.mark.slow
def test_sac_agent_trainer_pebble_loop(pendulum_trajs):
    """PEBBLE-style: SAC generator + replay relabeling in the RLHF loop."""
    from imitation_tpu.rl.sac import SAC, SACConfig

    venv = make_vec_env("Pendulum-v1", num_envs=4)
    reward_net = BasicRewardNet(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
    )
    sac = SAC(venv, SACConfig(
        learning_starts=32, batch_size=32, buffer_size=5000,
        actor_hid_sizes=(32,), critic_hid_sizes=(32,), train_freq=2,
    ))
    agent = pc.SACAgentTrainer(sac, reward_net, venv, rng=0, exploration_frac=0.1)
    main = pc.PreferenceComparisons(
        agent, reward_net, num_iterations=2, fragment_length=10,
        initial_epoch_multiplier=1, rng=0,
    )
    result = main.train(total_timesteps=256, total_comparisons=20)
    assert result["reward_loss"] is not None
    assert np.isfinite(result["reward_loss"])


def _make_pref_dataset(trajs, num_pairs=16, frag_len=10, seed=0):
    frag = pc.RandomFragmenter(rng=seed, warning_threshold=0)
    pairs = frag(trajs, fragment_length=frag_len, num_pairs=num_pairs)
    gatherer = pc.SyntheticGatherer(rng=np.random.default_rng(seed))
    ds = pc.PreferenceDataset()
    ds.push(pairs, gatherer(pairs))
    return ds


def test_reward_trainer_minibatch_grad_accum_equivalence(reward_net, pendulum_trajs):
    """Minibatched reward-trainer update == full-batch update
    (reference test_preference_comparisons.py:468 / :1253-1282 semantics)."""
    import optax

    variables = reward_net.init_variables(jax.random.key(0))
    ds = _make_pref_dataset(pendulum_trajs)
    params = []
    for mb in [None, 2]:
        model = pc.PreferenceModel(reward_net)
        trainer = pc.BasicRewardTrainer(
            model, epochs=2, batch_size=8, minibatch_size=mb, lr=1e-2, rng=0
        )
        # SGD keeps parameter updates linear in the gradients, so exact
        # grad-accumulation equivalence shows up as (near-)exact parameter
        # equality; Adam's normalization would amplify float noise.
        trainer.optimizer = optax.sgd(1e-2)
        trainer.attach(variables)
        trainer.train(ds)
        params.append(jax.device_get(trainer.variables["params"]))
    for a, b in zip(jax.tree.leaves(params[0]), jax.tree.leaves(params[1])):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_reward_trainer_minibatch_must_divide_batch(reward_net):
    model = pc.PreferenceModel(reward_net)
    with pytest.raises(ValueError, match="multiple of"):
        pc.BasicRewardTrainer(model, batch_size=8, minibatch_size=3)


def test_reward_trainer_uses_trailing_batch(reward_net, pendulum_trajs):
    """An incomplete trailing batch still trains (reference :1267-1283:
    its gradients come out proportionally smaller, not dropped). Batches
    are padded to a static shape; the weight mask carries the true size."""
    variables = reward_net.init_variables(jax.random.key(0))
    ds = _make_pref_dataset(pendulum_trajs, num_pairs=10)
    model = pc.PreferenceModel(reward_net)
    trainer = pc.BasicRewardTrainer(model, epochs=1, batch_size=8, rng=0)
    trainer.attach(variables)
    calls = []
    shapes = []
    orig = trainer._update_jit
    trainer._update_jit = lambda *a: (
        calls.append(float(a[3].sum())),
        shapes.append(a[2].prefs.shape[0]),
        orig(*a),
    )[2]
    trainer.train(ds)
    assert calls == [8.0, 2.0]  # full batch + trailing remainder
    assert shapes == [8, 8]  # both padded to one static jit shape


def test_ensemble_bagging_diversifies_members(pendulum_trajs):
    """With identical initial members, bagging (per-member bootstrap of the
    dataset, reference :1408-1424) must make member parameters diverge after
    training; training every member on identical batches would keep them
    bit-identical forever."""
    venv = make_vec_env("Pendulum-v1", num_envs=2)
    ens = RewardEnsemble(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
        member_cls=BasicRewardNet,
        num_members=3,
    )
    variables = ens.init_variables(jax.random.key(0))
    # Force all members to identical initial parameters.
    variables = jax.tree.map(
        lambda x: jnp.broadcast_to(x[:1], x.shape).copy(), variables
    )
    model = pc.PreferenceModel(ens)
    trainer = pc.EnsembleTrainer(model, epochs=2, batch_size=8, lr=1e-2, rng=0)
    trainer.attach(variables)
    ds = _make_pref_dataset(pendulum_trajs)
    trainer.train(ds)
    members = trainer.variables["params"]["members"]
    diverged = [
        float(np.abs(np.asarray(leaf[0]) - np.asarray(leaf[1])).max())
        for leaf in jax.tree.leaves(members)
    ]
    assert max(diverged) > 1e-6


def test_ensemble_minibatch_grad_accum_no_crash(pendulum_trajs):
    venv = make_vec_env("Pendulum-v1", num_envs=2)
    ens = RewardEnsemble(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
        member_cls=BasicRewardNet,
        num_members=2,
    )
    variables = ens.init_variables(jax.random.key(0))
    model = pc.PreferenceModel(ens)
    trainer = pc.EnsembleTrainer(
        model, epochs=1, batch_size=8, minibatch_size=4, rng=0
    )
    trainer.attach(variables)
    trainer.train(_make_pref_dataset(pendulum_trajs))


# ---------------------------------------------------------------------------
# Additional behavioral parity tests (reference
# tests/algorithms/test_preference_comparisons.py)
# ---------------------------------------------------------------------------


def test_fragments_terminal(pendulum_trajs):
    """A fragment is terminal iff it ends exactly at the end of a terminal
    trajectory (reference test_fragments_terminal)."""
    frag = pc.RandomFragmenter(rng=0, warning_threshold=0)
    pairs = frag(pendulum_trajs, fragment_length=20, num_pairs=30)
    lengths = {len(t) for t in pendulum_trajs}
    for f1, f2 in pairs:
        for f in (f1, f2):
            if f.terminal:
                # terminal fragments end at an episode end: the final obs of
                # some source trajectory equals this fragment's final obs
                assert any(
                    np.allclose(t.obs[-1], f.obs[-1]) for t in pendulum_trajs
                )
    assert lengths  # sanity


def test_agent_trainer_populates_buffer_and_samples(pendulum_trajs):
    venv = make_vec_env("Pendulum-v1", num_envs=4)
    reward_net = BasicRewardNet(
        observation_space=venv.observation_space, action_space=venv.action_space
    )
    policy = ActorCriticPolicy(
        observation_space=venv.observation_space, action_space=venv.action_space
    )
    ppo = PPO(venv, policy, PPOConfig(n_steps=64, n_minibatches=4, n_epochs=1))
    at = pc.AgentTrainer(ppo, reward_net, venv, rng=0)
    at.reward_variables = reward_net.init_variables(jax.random.key(0))
    at.train(256)
    # Pendulum truncates at 200; 256 steps x 4 envs may or may not complete
    # episodes, but sample() must still serve the requested transitions by
    # topping up with fresh rollouts.
    trajs = at.sample(400)
    assert sum(len(t) for t in trajs) >= 400
    for t in trajs:
        assert isinstance(t, types.TrajectoryWithRew)


def test_agent_trainer_requires_reward_variables(pendulum_trajs):
    venv = make_vec_env("Pendulum-v1", num_envs=2)
    reward_net = BasicRewardNet(
        observation_space=venv.observation_space, action_space=venv.action_space
    )
    policy = ActorCriticPolicy(
        observation_space=venv.observation_space, action_space=venv.action_space
    )
    ppo = PPO(venv, policy, PPOConfig(n_steps=8, n_minibatches=1, n_epochs=1))
    at = pc.AgentTrainer(ppo, reward_net, venv, rng=0)
    with pytest.raises(RuntimeError, match="reward_variables"):
        at.train(16)


def test_trajectory_dataset_seeding_and_not_static(pendulum_trajs):
    """Same seed -> same samples; successive samples differ
    (reference test_trajectory_dataset_seeding / _not_static)."""
    d1 = pc.TrajectoryDataset(pendulum_trajs, rng=7)
    d2 = pc.TrajectoryDataset(pendulum_trajs, rng=7)
    s1 = d1.sample(300)
    s2 = d2.sample(300)
    assert len(s1) == len(s2)
    for a, b in zip(s1, s2):
        np.testing.assert_array_equal(a.obs, b.obs)
    s3 = d1.sample(300)
    assert any(
        not np.array_equal(a.obs, b.obs) for a, b in zip(s1, s3)
    ) or len(s1) != len(s3)


def test_preference_dataset_save_load_roundtrip(tmp_path, pendulum_trajs):
    frag = pc.RandomFragmenter(rng=0, warning_threshold=0)
    pairs = frag(pendulum_trajs, fragment_length=10, num_pairs=4)
    prefs = np.array([0.0, 1.0, 0.5, 1.0], dtype=np.float32)
    ds = pc.PreferenceDataset()
    ds.push(pairs, prefs)
    path = tmp_path / "prefs.pkl"
    ds.save(path)
    ds2 = pc.PreferenceDataset.load(path)
    assert len(ds2) == len(ds)
    np.testing.assert_array_equal(ds2.preferences, ds.preferences)
    (f1a, _), _ = ds[0]
    (f1b, _), _ = ds2[0]
    np.testing.assert_array_equal(f1a.obs, f1b.obs)


def test_correct_reward_trainer_used_by_default():
    """Ensemble model gets an EnsembleTrainer, plain net a BasicRewardTrainer
    (reference test_correct_reward_trainer_used_by_default)."""
    venv = make_vec_env("Pendulum-v1", num_envs=2)
    basic = BasicRewardNet(
        observation_space=venv.observation_space, action_space=venv.action_space
    )
    ens = RewardEnsemble(
        observation_space=venv.observation_space, action_space=venv.action_space,
        member_cls=BasicRewardNet, num_members=3,
    )
    t1 = pc._make_reward_trainer(pc.PreferenceModel(basic))
    t2 = pc._make_reward_trainer(pc.PreferenceModel(ens))
    assert type(t1) is pc.BasicRewardTrainer
    assert type(t2) is pc.EnsembleTrainer


def test_ensemble_trainer_requires_ensemble_model(reward_net):
    with pytest.raises(TypeError, match="RewardEnsemble"):
        pc.EnsembleTrainer(pc.PreferenceModel(reward_net))


def test_discount_rate_no_crash(pendulum_trajs):
    """Discounted preference model end-to-end (reference
    test_discount_rate_no_crash)."""
    venv = make_vec_env("Pendulum-v1", num_envs=2)
    net = BasicRewardNet(
        observation_space=venv.observation_space, action_space=venv.action_space
    )
    model = pc.PreferenceModel(net, discount_factor=0.9)
    variables = net.init_variables(jax.random.key(0))
    frag = pc.RandomFragmenter(rng=0, warning_threshold=0)
    pairs = frag(pendulum_trajs, fragment_length=10, num_pairs=4)
    batch = pc.FragmentBatch.from_pairs(
        pairs, np.zeros(len(pairs), np.float32)
    )
    probs = model(variables, batch)
    assert probs.shape == (4,)
    assert bool(jnp.all((probs >= 0) & (probs <= 1)))


def test_reward_trainer_reproducible(reward_net, pendulum_trajs):
    """Same rng seed -> identical trained parameters (reference
    test_trainer_reproducible)."""
    frag = pc.RandomFragmenter(rng=0, warning_threshold=0)
    pairs = frag(pendulum_trajs, fragment_length=10, num_pairs=8)
    prefs = np.linspace(0, 1, 8).astype(np.float32)

    def run(seed):
        ds = pc.PreferenceDataset()
        ds.push(pairs, prefs)
        trainer = pc.BasicRewardTrainer(
            pc.PreferenceModel(reward_net), rng=seed, epochs=2, batch_size=4
        )
        trainer.attach(reward_net.init_variables(jax.random.key(0)))
        trainer.train(ds)
        return jax.device_get(trainer.variables["params"])

    p1, p2, p3 = run(5), run(5), run(6)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(a, b)
    assert any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p3))
    )


def test_normalized_reward_stats_update_through_loop(pendulum_trajs):
    """With a NormalizedRewardNet, relabel-time stats fold into the
    orchestrator's reward variables over training (reference relabels with
    update_stats=True, reward_nets.py:613-671)."""
    from imitation_tpu.models.networks import RunningNorm
    from imitation_tpu.rewards.reward_nets import NormalizedRewardNet

    venv = make_vec_env("Pendulum-v1", num_envs=4)
    base = BasicRewardNet(
        observation_space=venv.observation_space, action_space=venv.action_space
    )
    net = NormalizedRewardNet(
        observation_space=venv.observation_space, action_space=venv.action_space,
        base=base, normalize_cls=RunningNorm,
    )
    policy = ActorCriticPolicy(
        observation_space=venv.observation_space, action_space=venv.action_space
    )
    ppo = PPO(venv, policy, PPOConfig(n_steps=16, n_minibatches=2, n_epochs=1))
    at = pc.AgentTrainer(ppo, net, venv, rng=0)
    main = pc.PreferenceComparisons(
        at, net, num_iterations=2, fragment_length=10,
        initial_epoch_multiplier=1, rng=0,
    )
    count_before = float(
        jax.tree.leaves(
            {"c": main.reward_variables["stats"]}
        )[0].sum()
    )
    main.train(total_timesteps=128, total_comparisons=10)
    stats = main.reward_variables["stats"]
    leaves = jax.tree_util.tree_leaves_with_path(stats)
    counts = [v for p, v in leaves if "count" in jax.tree_util.keystr(p)]
    assert counts and float(counts[0]) > count_before
    # trainer's copy stays in sync so the next reward-training epoch sees
    # the same stats
    t_leaves = jax.tree_util.tree_leaves_with_path(
        main.reward_trainer.variables["stats"]
    )
    t_counts = [v for p, v in t_leaves if "count" in jax.tree_util.keystr(p)]
    assert float(t_counts[0]) == float(counts[0])


def _ensemble_model():
    venv = make_vec_env("Pendulum-v1", num_envs=2)
    ens = RewardEnsemble(
        observation_space=venv.observation_space, action_space=venv.action_space,
        member_cls=BasicRewardNet, num_members=3,
    )
    return pc.PreferenceModel(ens), ens


def test_active_fragmenter_uncertainty_on_not_supported():
    model, _ = _ensemble_model()
    with pytest.raises(ValueError, match="not supported"):
        pc.ActiveSelectionFragmenter(
            preference_model=model,
            base_fragmenter=pc.RandomFragmenter(rng=0, warning_threshold=0),
            fragment_sample_factor=2.0,
            uncertainty_on="bogus",
        )


@pytest.mark.parametrize("uncertainty_on", ["logit", "probability", "label"])
def test_active_fragmenter_uncertainty_modes(pendulum_trajs, uncertainty_on):
    model, ens = _ensemble_model()
    frag = pc.ActiveSelectionFragmenter(
        preference_model=model,
        base_fragmenter=pc.RandomFragmenter(rng=0, warning_threshold=0),
        fragment_sample_factor=2.0,
        uncertainty_on=uncertainty_on,
    )
    frag.variables = ens.init_variables(jax.random.key(0))
    pairs = frag(pendulum_trajs, fragment_length=10, num_pairs=3)
    assert len(pairs) == 3


def test_orchestrator_bad_query_schedule_raises(pendulum_trajs):
    with pytest.raises(ValueError, match="query schedule"):
        pc.PreferenceComparisons(
            pc.TrajectoryDataset(pendulum_trajs, rng=0),
            BasicRewardNet(
                observation_space=make_vec_env("Pendulum-v1", num_envs=2).observation_space,
                action_space=make_vec_env("Pendulum-v1", num_envs=2).action_space,
            ),
            num_iterations=2,
            query_schedule="bogus",
        )


def test_orchestrator_bad_initial_comparison_frac_raises(pendulum_trajs):
    venv = make_vec_env("Pendulum-v1", num_envs=2)
    with pytest.raises(ValueError, match="initial_comparison_frac"):
        pc.PreferenceComparisons(
            pc.TrajectoryDataset(pendulum_trajs, rng=0),
            BasicRewardNet(
                observation_space=venv.observation_space,
                action_space=venv.action_space,
            ),
            num_iterations=2,
            initial_comparison_frac=1.5,
        )


def test_relabel_alpha_requires_ensemble(reward_net):
    venv = make_vec_env("Pendulum-v1", num_envs=2)
    policy = ActorCriticPolicy(
        observation_space=venv.observation_space, action_space=venv.action_space
    )
    ppo = PPO(venv, policy, PPOConfig(n_steps=8, n_minibatches=1, n_epochs=1))
    with pytest.raises(TypeError, match="ensemble"):
        pc.AgentTrainer(ppo, reward_net, venv, rng=0, relabel_alpha=0.5)


def test_relabel_alpha_adds_std(pendulum_trajs):
    """relabel_alpha shifts relabeled rewards by alpha*std over members
    (reference AddSTDRewardWrapper, reward_nets.py:1019-1078)."""
    model, ens = _ensemble_model()
    variables = ens.init_variables(jax.random.key(0))
    fn0 = pc._make_relabel_fn(ens, 0.0)
    fn2 = pc._make_relabel_fn(ens, 2.0)
    fn_none = pc._make_relabel_fn(ens, None)
    obs = jnp.ones((5, 3))
    acts = jnp.ones((5, 1))
    dones = jnp.zeros((5,))
    r0 = fn0(variables, obs, acts, obs, dones)
    r2 = fn2(variables, obs, acts, obs, dones)
    rn = fn_none(variables, obs, acts, obs, dones)
    mean, var = ens.apply(variables, obs, acts, obs, dones,
                          method="predict_reward_moments")
    np.testing.assert_allclose(np.asarray(r0), np.asarray(mean), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(r2), np.asarray(mean + 2.0 * jnp.sqrt(var)), rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(rn), np.asarray(mean), rtol=1e-5)


def test_sac_agent_trainer_folds_normalizer_stats(pendulum_trajs):
    """PEBBLE + NormalizedRewardNet: replay-relabel stats update after
    train() (mirrors the PPO AgentTrainer fold)."""
    from imitation_tpu.models.networks import RunningNorm
    from imitation_tpu.rewards.reward_nets import NormalizedRewardNet
    from imitation_tpu.rl.sac import SAC, SACConfig

    venv = make_vec_env("Pendulum-v1", num_envs=2)
    net = NormalizedRewardNet(
        observation_space=venv.observation_space, action_space=venv.action_space,
        base=BasicRewardNet(
            observation_space=venv.observation_space,
            action_space=venv.action_space,
        ),
        normalize_cls=RunningNorm,
    )
    sac = SAC(venv, SACConfig(train_freq=8, batch_size=32, learning_starts=16), seed=0)
    at = pc.SACAgentTrainer(sac, net, venv, rng=0)
    at.reward_variables = net.init_variables(jax.random.key(0))
    leaves0 = jax.tree_util.tree_leaves_with_path(at.reward_variables["stats"])
    count0 = float([v for p, v in leaves0 if "count" in jax.tree_util.keystr(p)][0])
    at.train(64)
    leaves1 = jax.tree_util.tree_leaves_with_path(at.reward_variables["stats"])
    count1 = float([v for p, v in leaves1 if "count" in jax.tree_util.keystr(p)][0])
    assert count1 > count0


def test_agent_trainer_exploration_on_host_env():
    """exploration_frac sampling over a HOST env runs the Markov-switching
    mixture through the host rollout path (device scan can't step host
    envs); regression for the jax-key-into-numpy-seed crash."""
    from imitation_tpu.envs.gym_bridge import GymHostEnv, HostVectorEnv
    from imitation_tpu.models.policies import ActorCriticPolicy
    from imitation_tpu.rl.ppo import PPO, PPOConfig

    env = GymHostEnv("Pendulum-v1")
    venv = HostVectorEnv(env, num_envs=2, max_episode_steps=10, num_threads=1)
    policy = ActorCriticPolicy(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
        hid_sizes=(8,),
    )
    ppo = PPO(venv, policy, PPOConfig(n_steps=8, n_minibatches=2, n_epochs=1), seed=0)
    net = BasicRewardNet(
        observation_space=venv.observation_space, action_space=venv.action_space
    )
    trainer = pc.AgentTrainer(ppo, net, venv, rng=0, exploration_frac=0.5)
    trainer.reward_variables = net.init_variables(jax.random.key(0))
    trajs = trainer.sample(40)
    assert sum(len(t) for t in trajs) >= 40
    assert all(np.isfinite(np.asarray(t.rews)).all() for t in trajs)
    venv.close()

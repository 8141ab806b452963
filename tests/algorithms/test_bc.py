"""BC tests: mechanics, gradient-accumulation equivalence, learning gate.

Modeled on reference tests/algorithms/test_bc.py — including the
minibatch-vs-fullbatch parameter-equivalence test (reference test_bc.py:235)
and the statistical reward-improvement gate (reference test_bc.py:200).
"""

import jax
import numpy as np
import pytest

from imitation_tpu.algorithms.bc import BC
from imitation_tpu.data import rollout
from imitation_tpu.envs import make_vec_env
from imitation_tpu.testing import experts
from imitation_tpu.testing.reward_improvement import is_significant_reward_improvement


@pytest.fixture(scope="module")
def cartpole_demos():
    venv = make_vec_env("CartPole-v1", num_envs=8, max_episode_steps=100)
    return experts.generate_expert_trajectories("CartPole-v1", venv, min_episodes=10)


def make_bc(demos, **kwargs):
    venv = make_vec_env("CartPole-v1", num_envs=4)
    defaults = dict(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
        demonstrations=demos,
        rng=0,
        batch_size=32,
    )
    defaults.update(kwargs)
    return BC(**defaults)


def test_bc_train_runs(cartpole_demos):
    bc = make_bc(cartpole_demos)
    bc.train(n_batches=10)
    assert int(bc.state.num_batches) == 10


def test_bc_requires_exactly_one_budget(cartpole_demos):
    bc = make_bc(cartpole_demos)
    with pytest.raises(ValueError, match="exactly one"):
        bc.train()
    with pytest.raises(ValueError, match="exactly one"):
        bc.train(n_epochs=1, n_batches=1)


def test_bc_no_demos_raises():
    venv = make_vec_env("CartPole-v1", num_envs=2)
    bc = BC(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
        rng=0,
    )
    with pytest.raises(ValueError, match="No demonstrations"):
        bc.train(n_epochs=1)


def test_bc_invalid_minibatch_raises(cartpole_demos):
    with pytest.raises(ValueError, match="multiple"):
        make_bc(cartpole_demos, batch_size=32, minibatch_size=5)


def test_gradient_accumulation_equivalence(cartpole_demos):
    """minibatch_size < batch_size gives identical parameters (reference
    test_bc.py:235 asserts closeness under fixed seeds)."""
    bc_full = make_bc(cartpole_demos, batch_size=32, minibatch_size=32)
    bc_micro = make_bc(cartpole_demos, batch_size=32, minibatch_size=8)
    bc_full.train(n_batches=4)
    bc_micro.train(n_batches=4)
    p1 = jax.tree.leaves(bc_full.state.variables["params"])
    p2 = jax.tree.leaves(bc_micro.state.variables["params"])
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_epoch_end_callbacks(cartpole_demos):
    counts = {"epoch": 0, "batch": 0}
    bc = make_bc(cartpole_demos)
    bc.train(
        n_epochs=2,
        on_epoch_end=lambda: counts.__setitem__("epoch", counts["epoch"] + 1),
        on_batch_end=lambda: counts.__setitem__("batch", counts["batch"] + 1),
    )
    assert counts["epoch"] == 2
    assert counts["batch"] == int(bc.state.num_batches)


@pytest.mark.slow
def test_bc_improves_rewards(cartpole_demos):
    """Statistical learning gate (reference test_that_bc_improves_rewards)."""
    venv = make_vec_env("CartPole-v1", num_envs=8)
    bc = make_bc(cartpole_demos, batch_size=64)
    novice = rollout.generate_trajectories(
        bc.policy.sample_fn(), bc.state.variables, venv,
        rollout.make_min_episodes(10), rng=0,
    )
    novice_returns = [t.rews.sum() for t in novice]
    bc.train(n_epochs=12)
    trained = rollout.generate_trajectories(
        bc.policy.sample_fn(), bc.state.variables, venv,
        rollout.make_min_episodes(10), rng=1,
    )
    trained_returns = [t.rews.sum() for t in trained]
    assert is_significant_reward_improvement(novice_returns, trained_returns)
    assert np.mean(trained_returns) > 3 * np.mean(novice_returns)


def test_set_demonstrations_invalidates_cached_programs(cartpole_demos):
    """Replacing demos after training must not reuse stale jitted epochs
    (DAgger replaces demonstrations every round)."""
    bc = make_bc(cartpole_demos, batch_size=32)
    bc.train(n_batches=4)
    loss_key = "loss"
    # New demos with identical batch count but different content: all-left
    # actions. Training on them should push the policy toward action 0.
    flipped = []
    for t in cartpole_demos:
        flipped.append(
            type(t)(obs=t.obs, acts=np.zeros_like(t.acts), rews=t.rews,
                    infos=t.infos, terminal=t.terminal)
        )
    bc.set_demonstrations(flipped)
    bc.train(n_epochs=3)
    import jax.numpy as jnp

    dist = bc.policy.distribution(bc.state.variables, jnp.zeros((8, 4)))
    preds = np.asarray(dist.mode())
    assert (preds == 0).all(), "policy should imitate the replaced demos"

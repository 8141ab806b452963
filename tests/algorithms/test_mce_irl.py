"""MCE IRL tests: partition/occupancy checks vs closed form + recovery.

Modeled on reference tests/algorithms/test_mce_irl.py (:70 random MDPs,
closed-form checks, test_mce_irl_reasonable_mdp :442).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imitation_tpu.algorithms.mce_irl import (
    MCEIRL,
    MLPRewardNet,
    mce_occupancy_measures,
    mce_partition_fh,
    sample_tabular_trajectories,
)
from imitation_tpu.envs.tabular import TabularMDP, random_mdp


def det_chain_mdp(horizon=3):
    """2-state deterministic chain: action 0 stays, action 1 moves to state 1."""
    T = np.zeros((2, 2, 2), np.float32)
    T[0, 0, 0] = 1.0
    T[0, 1, 1] = 1.0
    T[1, 0, 1] = 1.0
    T[1, 1, 1] = 1.0
    R = np.array([0.0, 1.0], np.float32)
    init = np.array([1.0, 0.0], np.float32)
    return TabularMDP(T, R, horizon, init)


def test_partition_shapes_and_policy_normalization():
    env = random_mdp(5, 3, horizon=7, seed=0)
    V, Q, pi = mce_partition_fh(env)
    assert V.shape == (7, 5)
    assert Q.shape == (7, 5, 3)
    assert pi.shape == (7, 5, 3)
    np.testing.assert_allclose(np.asarray(pi).sum(-1), 1.0, atol=1e-5)


def test_partition_last_step_closed_form():
    """At the last step, Q = R(s) per action and V = logsumexp."""
    env = det_chain_mdp()
    V, Q, pi = mce_partition_fh(env)
    # last step: Q[T-1, s, a] = R(s), so pi uniform
    np.testing.assert_allclose(np.asarray(pi[-1]), 0.5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(V[-1]), np.log(2) + env.reward_matrix, atol=1e-5
    )


def test_occupancy_sums_to_horizon():
    env = random_mdp(6, 2, horizon=5, seed=1)
    Dt, D = mce_occupancy_measures(env)
    assert Dt.shape == (5, 6)
    np.testing.assert_allclose(np.asarray(Dt).sum(-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(np.asarray(D).sum()), 5.0, atol=1e-4)
    # Dt[0] is the initial distribution
    np.testing.assert_allclose(np.asarray(Dt[0]), env.initial_state_dist, atol=1e-6)


def test_occupancy_matches_monte_carlo():
    env = random_mdp(4, 2, horizon=6, seed=2)
    _, _, pi = mce_partition_fh(env)
    Dt, D = mce_occupancy_measures(env, pi=pi)
    trajs = sample_tabular_trajectories(env, pi, 3000, jax.random.key(0))
    obs_mat = env.observation_matrix
    counts = np.zeros(env.n_states)
    for t in trajs:
        obs = np.asarray(t.obs)[:-1]  # visited states (excluding final next)
        for row in obs:
            s = np.abs(obs_mat - row[None]).sum(1).argmin()
            counts[s] += 1
    mc_om = counts / len(trajs)
    np.testing.assert_allclose(mc_om, np.asarray(D), atol=0.15)


def test_mceirl_recovers_occupancy_from_om_vector():
    env = det_chain_mdp(horizon=4)
    _, D_true = mce_occupancy_measures(env)
    irl = MCEIRL(np.asarray(D_true, np.float64), env, log_interval=None,
                 optimizer_kwargs=dict(lr=0.1))
    irl.train(max_iter=500)
    _, _, pi = mce_partition_fh(
        env,
        reward=jnp.asarray(
            irl.reward_net.apply(irl.variables, jnp.asarray(env.observation_matrix))
        ),
    )
    _, D_learned = mce_occupancy_measures(env, pi=pi)
    np.testing.assert_allclose(np.asarray(D_learned), np.asarray(D_true), atol=0.05)


def test_mceirl_from_trajectories():
    env = random_mdp(4, 2, horizon=5, seed=3)
    _, _, pi = mce_partition_fh(env)
    demos = sample_tabular_trajectories(env, pi, 200, jax.random.key(1))
    irl = MCEIRL(demos, env, log_interval=None, optimizer_kwargs=dict(lr=0.05))
    r = irl.train(max_iter=300)
    assert r.shape == (4,)
    # learned policy induces occupancy close to demo occupancy
    _, D_demo = mce_occupancy_measures(env, pi=pi)
    _, _, pi_l = mce_partition_fh(env, reward=jnp.asarray(r))
    _, D_l = mce_occupancy_measures(env, pi=pi_l)
    assert np.abs(np.asarray(D_l) - np.asarray(D_demo)).max() < 0.25


def test_mceirl_mlp_reward_net():
    env = random_mdp(4, 2, horizon=4, obs_dim=6, seed=4)
    _, D = mce_occupancy_measures(env)
    irl = MCEIRL(
        np.asarray(D, np.float64), env, reward_net=MLPRewardNet(hid_sizes=(16,)),
        log_interval=None,
    )
    irl.train(max_iter=50)


def test_om_vector_wrong_shape_raises():
    env = det_chain_mdp()
    with pytest.raises(ValueError, match="OM vector"):
        MCEIRL(np.zeros(5), env)


def test_transition_matrix_validation():
    T = np.zeros((2, 1, 2), np.float32)  # rows don't sum to 1
    with pytest.raises(ValueError, match="sum to 1"):
        TabularMDP(T, np.zeros(2), 3)


# ---------------------------------------------------------------------------
# TabularPolicy behavior (reference test_tabular_policy / _randomness /
# _rollouts) + learned-reward quality gate (test_mce_irl_reasonable_mdp :442)
# ---------------------------------------------------------------------------
from imitation_tpu.algorithms.mce_irl import TabularPolicy


def test_tabular_policy_validation_and_predict():
    env = random_mdp(4, 2, horizon=5, seed=1)
    _, _, pi = mce_partition_fh(env)
    pol = TabularPolicy(env, np.asarray(pi), rng=0)
    with pytest.raises(AssertionError):
        pol.set_pi(np.zeros((env.horizon, env.n_states, env.n_actions)))
    acts = pol.predict(np.array([0, 1, 2]), np.array([0, 1, 4]))
    assert acts.shape == (3,)
    assert ((acts >= 0) & (acts < env.n_actions)).all()


def test_tabular_policy_randomness():
    """A uniform policy samples both actions; a deterministic one never
    deviates (reference test_tabular_policy_randomness)."""
    env = det_chain_mdp(horizon=4)
    uniform = np.full((4, 2, 2), 0.5, np.float32)
    pol = TabularPolicy(env, uniform, rng=0)
    acts = pol.predict(np.zeros(200, np.int64), np.zeros(200, np.int64))
    assert set(np.unique(acts)) == {0, 1}
    det = np.zeros((4, 2, 2), np.float32)
    det[:, :, 1] = 1.0
    pol.set_pi(det)
    acts = pol.predict(np.zeros(50, np.int64), np.zeros(50, np.int64))
    assert (acts == 1).all()


def test_tabular_rollouts_match_occupancy():
    """Empirical state visitation from sampled episodes approximates the
    computed occupancy measure (reference test_policy_om_random_mdp)."""
    env = random_mdp(4, 3, horizon=6, seed=3)
    _, _, pi = mce_partition_fh(env)
    _, D = mce_occupancy_measures(env, pi=pi)
    trajs = sample_tabular_trajectories(env, pi, 3000, jax.random.key(0))
    visits = np.zeros(env.n_states)
    for t in trajs:
        # obs are one-hot feature rows; recover state ids
        states = np.argmax(np.asarray(t.obs[:-1]), axis=-1)
        for s in states:
            visits[s] += 1
    visits /= len(trajs)
    np.testing.assert_allclose(visits, np.asarray(D), atol=0.25)


def test_mce_irl_reasonable_mdp_learned_reward_matches_om():
    """Training to convergence on a random MDP: the learned reward's induced
    occupancy matches the demo occupancy (reference
    test_mce_irl_reasonable_mdp)."""
    env = random_mdp(5, 3, horizon=8, seed=7)
    _, _, pi_expert = mce_partition_fh(env)
    _, D_demo = mce_occupancy_measures(env, pi=pi_expert)
    trainer = MCEIRL(D_demo, env, linf_eps=1e-3)
    trainer.train(max_iter=500)
    # induced occupancy from the final policy
    _, D_learned = mce_occupancy_measures(env, pi=jnp.asarray(trainer.policy.pi))
    np.testing.assert_allclose(np.asarray(D_learned), np.asarray(D_demo), atol=2e-2)


def test_mceirl_transitions_demo_format_raises():
    """Transitions lack episode structure for discounted OM; MCE IRL rejects
    them with a clear error (reference accepts them only undiscounted;
    mce_irl.py:402-465)."""
    from imitation_tpu.data import types

    env = random_mdp(4, 2, horizon=5, seed=0)
    t = types.Transitions(
        obs=np.zeros((4, env.n_states), np.float32),
        acts=np.zeros((4,), np.int64),
        infos=None,
        next_obs=np.zeros((4, env.n_states), np.float32),
        dones=np.zeros((4,), bool),
    )
    with pytest.raises(TypeError, match="occupancy-measure|trajectories"):
        MCEIRL(t, env)

"""GAIL/AIRL tests: loop mechanics, disc improvement, learning gate.

Modeled on reference tests/algorithms/test_adversarial.py: train_disc /
train_gen no-crash across algo parametrizations (:213,230), discriminator
loss decreases when trained (:256), and a small end-to-end learning check.
"""

import jax
import numpy as np
import pytest

from imitation_tpu.algorithms.adversarial.airl import AIRL
from imitation_tpu.algorithms.adversarial.gail import GAIL
from imitation_tpu.data import rollout
from imitation_tpu.envs import make_vec_env
from imitation_tpu.rl.ppo import PPOConfig
from imitation_tpu.testing import experts

ALGOS = [GAIL, AIRL]


@pytest.fixture(scope="module")
def cartpole_demos():
    venv = make_vec_env("CartPole-v1", num_envs=8, max_episode_steps=100)
    return experts.generate_expert_trajectories("CartPole-v1", venv, min_episodes=10)


def make_trainer(algo_cls, demos, env_name="CartPole-v1", **kwargs):
    venv = make_vec_env(env_name, num_envs=4, max_episode_steps=100)
    defaults = dict(
        demonstrations=demos,
        demo_batch_size=64,
        venv=venv,
        gen_config=PPOConfig(n_steps=32, n_minibatches=4, n_epochs=2),
        n_disc_updates_per_round=2,
        allow_variable_horizon=True,
        seed=0,
    )
    defaults.update(kwargs)
    return algo_cls(**defaults)


@pytest.mark.parametrize("algo_cls", ALGOS)
def test_train_disc_before_gen_raises(algo_cls, cartpole_demos):
    trainer = make_trainer(algo_cls, cartpole_demos)
    with pytest.raises(RuntimeError, match="train_gen"):
        trainer.train_disc()


@pytest.mark.parametrize("algo_cls", ALGOS)
def test_train_gen_then_disc_no_crash(algo_cls, cartpole_demos):
    trainer = make_trainer(algo_cls, cartpole_demos)
    gen_metrics = trainer.train_gen()
    assert np.isfinite(gen_metrics["loss"])
    stats = trainer.train_disc()
    for k in ["disc_loss", "disc_acc", "disc_entropy"]:
        assert k in stats and np.isfinite(stats[k]), k


@pytest.mark.parametrize("algo_cls", ALGOS)
def test_train_smoke(algo_cls, cartpole_demos):
    trainer = make_trainer(algo_cls, cartpole_demos)
    trainer.train(total_timesteps=2 * trainer.gen_train_timesteps)
    assert trainer._global_step == 2


def test_demo_batch_too_large_raises(cartpole_demos):
    with pytest.raises(ValueError, match="demo_batch_size"):
        make_trainer(GAIL, cartpole_demos, demo_batch_size=10**7)


@pytest.mark.parametrize("algo_cls", ALGOS)
def test_train_disc_improves_discriminator(algo_cls, cartpole_demos):
    """Repeated disc updates on fixed data reduce disc loss
    (reference test_train_disc_improve_D, test_adversarial.py:256)."""
    trainer = make_trainer(algo_cls, cartpole_demos)
    trainer.train_gen()
    first = trainer.train_disc()["disc_loss"]
    for _ in range(10):
        last = trainer.train_disc()["disc_loss"]
    assert last < first


def test_gail_reward_is_softplus_of_logit(cartpole_demos):
    import jax.numpy as jnp

    trainer = make_trainer(GAIL, cartpole_demos)
    obs = jnp.zeros((3, 4))
    acts = jnp.zeros((3,), jnp.int32)
    dones = jnp.zeros((3,))
    logits = trainer.logits_expert_is_high(
        trainer.disc_state.variables, obs, acts, obs, dones
    )
    rewards = trainer.reward_train_fn()(trainer.disc_state.variables, obs, acts, obs, dones)
    np.testing.assert_allclose(
        np.asarray(rewards), np.log1p(np.exp(np.asarray(logits))), rtol=1e-5
    )
    assert (np.asarray(rewards) > 0).all()  # GAIL reward is always positive


def test_airl_test_reward_strips_shaping(cartpole_demos):
    import jax.numpy as jnp

    trainer = make_trainer(AIRL, cartpole_demos)
    obs = jnp.ones((3, 4))
    acts = jnp.zeros((3,), jnp.int32)
    dones = jnp.zeros((3,))
    r_train = trainer.reward_train_fn()(trainer.disc_state.variables, obs, acts, obs, dones)
    r_test = trainer.reward_test_fn()(trainer.disc_state.variables, obs, acts, obs, dones)
    assert not np.allclose(np.asarray(r_train), np.asarray(r_test))


@pytest.mark.slow
def test_gail_improves_cartpole(cartpole_demos):
    trainer = make_trainer(
        GAIL,
        cartpole_demos,
        gen_config=PPOConfig(
            n_steps=128, n_minibatches=8, n_epochs=5, learning_rate=1e-3, ent_coef=0.01
        ),
        demo_batch_size=256,
        n_disc_updates_per_round=4,
    )
    venv = trainer.venv
    state0 = trainer.gen_algo.init_state(jax.random.key(7))
    novice = rollout.generate_trajectories(
        trainer.policy.sample_fn(), state0.variables, venv,
        rollout.make_min_episodes(10), rng=0,
    )
    novice_ret = np.mean([t.rews.sum() for t in novice])
    trainer.train(total_timesteps=25 * trainer.gen_train_timesteps)
    trained = rollout.generate_trajectories(
        trainer.policy.sample_fn(), trainer.policy_variables, venv,
        rollout.make_min_episodes(10), rng=1,
    )
    trained_ret = np.mean([t.rews.sum() for t in trained])
    assert trained_ret > novice_ret + 15, f"{novice_ret} -> {trained_ret}"


@pytest.mark.parametrize("algo_cls", ALGOS)
def test_disc_minibatch_grad_accum_equivalence(algo_cls, cartpole_demos):
    """Minibatched disc update == full-batch update under a fixed seed
    (reference test_adversarial.py:285: gradient accumulation with the loss
    renormalized by mb/batch must produce the same parameters)."""
    import optax

    results = []
    for mb in [None, 16]:
        trainer = make_trainer(algo_cls, cartpole_demos, demo_minibatch_size=mb)
        # SGD keeps updates linear in the gradients (see the reward-trainer
        # equivalence test for why Adam would amplify float noise).
        trainer.disc_optimizer = optax.sgd(1e-2)
        trainer.disc_state = trainer.disc_state.replace(
            opt_state=trainer.disc_optimizer.init(
                trainer.disc_state.variables["params"]
            )
        )
        trainer.train_gen()
        trainer.train_disc()
        results.append(jax.device_get(trainer.disc_state.variables["params"]))
    flat_full = jax.tree.leaves(results[0])
    flat_mb = jax.tree.leaves(results[1])
    for a, b in zip(flat_full, flat_mb):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_disc_minibatch_must_divide_batch(cartpole_demos):
    with pytest.raises(ValueError, match="divisible"):
        make_trainer(GAIL, cartpole_demos, demo_minibatch_size=7)


@pytest.mark.parametrize("algo_cls", ALGOS)
def test_train_fused_runs_and_advances(algo_cls, cartpole_demos):
    """The scanned multi-round program executes and advances both chains."""
    trainer = make_trainer(algo_cls, cartpole_demos)
    trainer.train_fused(4 * trainer.gen_train_timesteps, rounds_per_sync=2)
    assert int(trainer.gen_state.n_updates) == 4
    assert int(trainer.disc_state.step) == 4 * trainer.n_disc_updates_per_round


# ---------------------------------------------------------------------------
# SAC generator (reference test_train_adversarial_sac /
# test_regression_gail_with_sac: any off-policy SB3 algo can generate, with
# replay relabeled through the current learned reward at sample time)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pendulum_demos():
    venv = make_vec_env("Pendulum-v1", num_envs=8)
    return experts.generate_expert_trajectories("Pendulum-v1", venv, min_episodes=6)


def make_sac_trainer(algo_cls, demos, **kwargs):
    from imitation_tpu.rl.sac import SAC, SACConfig

    venv = make_vec_env("Pendulum-v1", num_envs=4)
    sac = SAC(
        venv,
        SACConfig(train_freq=16, batch_size=64, learning_starts=32,
                  gradient_steps=2),
        seed=3,
    )
    defaults = dict(
        demonstrations=demos,
        demo_batch_size=64,
        venv=venv,
        gen_algo=sac,
        n_disc_updates_per_round=2,
        allow_variable_horizon=True,
        seed=0,
    )
    defaults.update(kwargs)
    return algo_cls(**defaults)


@pytest.mark.parametrize("algo_cls", ALGOS)
def test_sac_generator_train_no_crash(algo_cls, pendulum_demos):
    trainer = make_sac_trainer(algo_cls, pendulum_demos)
    gen_metrics = trainer.train_gen()
    assert np.isfinite(gen_metrics["critic_loss"])
    stats = trainer.train_disc()
    for k in ["disc_loss", "disc_acc", "disc_entropy"]:
        assert k in stats and np.isfinite(stats[k]), k
    trainer.train(total_timesteps=2 * trainer.gen_train_timesteps)


def test_sac_generator_relabels_replay(pendulum_demos):
    """The SAC update consumes learned rewards, not env rewards: zeroing the
    disc variables changes the sampled batch rewards (ReplayBufferRewardWrapper
    semantics, reference policies/replay_buffer_wrapper.py:26-103)."""
    import jax.numpy as jnp

    trainer = make_sac_trainer(GAIL, pendulum_demos)
    sac = trainer.gen_algo
    trainer.train_gen()
    state = trainer.gen_state
    key = jax.random.key(0)
    batch = sac.replay.sample(state.buffer_state, key, 32)
    relabeled = sac.relabel_fn(trainer.disc_state.variables, batch)
    # env rewards in Pendulum are <= 0; GAIL rewards are strictly positive
    assert float(jnp.min(relabeled.rews)) > 0.0
    assert float(jnp.max(batch.rews)) <= 0.0


def test_sac_log_prob_matches_sample(pendulum_demos):
    """log_prob_fn evaluated at freshly sampled actions agrees with the
    sampler's own log-prob (incl. the env-scaling jacobian)."""
    trainer = make_sac_trainer(AIRL, pendulum_demos)
    sac = trainer.gen_algo
    state = sac.init_state()
    obs = np.random.default_rng(0).normal(size=(16, 3)).astype(np.float32)
    acts, info = sac.sample_fn()(state.variables, obs, jax.random.key(1))
    lp = sac.log_prob_fn()(state.variables, obs, acts)
    # sampler log-prob is for squashed actions; env scaling adds -log|scale|
    scale = float(np.asarray(sac._act_scale).reshape(-1).prod())
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(info["log_prob"]) - np.log(scale),
        rtol=1e-3, atol=1e-3,
    )


def test_sac_policy_save_roundtrip(tmp_path, pendulum_demos):
    from imitation_tpu.policies import serialize as policy_serialize

    trainer = make_sac_trainer(GAIL, pendulum_demos)
    trainer.train_gen()
    policy_serialize.save_policy(
        str(tmp_path / "p"), trainer.policy, trainer.policy_variables
    )
    policy2, vars2 = policy_serialize.load_policy_from_path(str(tmp_path / "p"))
    obs = np.zeros((2, 3), np.float32)
    a1, _ = trainer.policy.deterministic_fn()(trainer.policy_variables, obs, jax.random.key(0))
    a2, _ = policy2.deterministic_fn()(vars2, obs, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-6)

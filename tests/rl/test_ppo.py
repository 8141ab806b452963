"""PPO learner tests: mechanics + learning on CartPole/Pendulum."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imitation_tpu.envs import make_vec_env
from imitation_tpu.models.policies import ActorCriticPolicy
from imitation_tpu.rl.ppo import PPO, PPOConfig


def make_ppo(env_name="CartPole-v1", num_envs=8, **cfg_kwargs):
    venv = make_vec_env(env_name, num_envs=num_envs)
    policy = ActorCriticPolicy(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
        hid_sizes=(32, 32),
    )
    defaults = dict(n_steps=64, n_minibatches=4, n_epochs=4, learning_rate=3e-4)
    defaults.update(cfg_kwargs)
    return PPO(venv, policy, PPOConfig(**defaults))


def test_train_step_runs_and_metrics():
    ppo = make_ppo()
    state = ppo.init_state()
    state, metrics = ppo._train_step_jit(state)
    for k in ["loss", "policy_loss", "value_loss", "entropy", "approx_kl",
              "clip_fraction", "explained_variance", "grad_norm"]:
        assert k in metrics
        assert np.isfinite(float(metrics[k])), k
    assert int(state.timesteps) == 64 * 8
    assert int(state.n_updates) == 1


def test_invalid_minibatch_split_raises():
    with pytest.raises(ValueError, match="not divisible"):
        make_ppo(n_steps=10, n_minibatches=3)


def test_params_change():
    ppo = make_ppo()
    state = ppo.init_state()
    before = jax.tree.map(np.asarray, state.variables["params"])
    state, _ = ppo._train_step_jit(state)
    after = state.variables["params"]
    changed = jax.tree.map(lambda a, b: not np.allclose(a, np.asarray(b)), before, after)
    assert any(jax.tree.leaves(changed))


@pytest.mark.slow
def test_ppo_learns_cartpole():
    ppo = make_ppo(
        num_envs=16, n_steps=128, n_minibatches=8, n_epochs=10,
        learning_rate=1e-3, ent_coef=0.01,
    )
    state = ppo.init_state(jax.random.key(0))
    returns = []
    for i in range(30):
        state, metrics = ppo._train_step_jit(state)
        r = float(metrics["ep_return_mean"])
        if np.isfinite(r):
            returns.append(r)
    early = np.mean(returns[:3])
    late = np.mean(returns[-3:])
    assert late > early + 30, f"PPO failed to learn: early={early:.1f} late={late:.1f}"
    assert late > 100


def test_ppo_continuous_runs():
    ppo = make_ppo("Pendulum-v1", num_envs=4, n_steps=32, n_minibatches=4, n_epochs=2)
    state = ppo.init_state()
    state, metrics = ppo._train_step_jit(state)
    assert np.isfinite(float(metrics["loss"]))


def test_reward_relabeling_path():
    """A constant reward_fn changes training rewards but not monitor stats."""
    venv = make_vec_env("CartPole-v1", num_envs=4, max_episode_steps=20)
    policy = ActorCriticPolicy(
        observation_space=venv.observation_space, action_space=venv.action_space
    )
    def reward_fn(params, obs, acts, next_obs, dones):
        return jnp.full(obs.shape[0], 0.5)
    ppo = PPO(venv, policy, PPOConfig(n_steps=64, n_minibatches=4, n_epochs=1),
              reward_fn=reward_fn)
    state = ppo.init_state()
    state, metrics = ppo._train_step_jit(state, None)
    assert abs(float(metrics["relabeled_rew_mean"]) - 0.5) < 1e-6
    assert abs(float(metrics["true_rew_mean"]) - 1.0) < 1e-6
    # Monitor return uses true rewards: mean ep return == ep length for CartPole.
    if np.isfinite(float(metrics["ep_return_mean"])):
        assert abs(float(metrics["ep_return_mean"]) - float(metrics["ep_len_mean"])) < 1e-4


def test_reward_normalization():
    """normalize_rewards scales training rewards to ~unit variance without
    touching monitor stats (SB3 VecNormalize semantics)."""
    ppo = make_ppo(n_steps=64, n_minibatches=4, n_epochs=1, normalize_rewards=True)
    state = ppo.init_state()
    assert state.reward_norm is not None
    for _ in range(5):
        state, metrics = ppo._train_step_jit(state)
    # running stats accumulated
    assert float(state.reward_norm.count) == 5 * 64 * 8  # iters * T * B samples
    assert float(state.reward_norm.var) > 0
    # monitor returns still report true reward (CartPole: return == length)
    if np.isfinite(float(metrics["ep_return_mean"])):
        assert abs(
            float(metrics["ep_return_mean"]) - float(metrics["ep_len_mean"])
        ) < 1e-4


def test_linear_lr_schedule():
    ppo = make_ppo(lr_schedule="linear", total_updates_hint=10)
    state = ppo.init_state()
    state, m1 = ppo._train_step_jit(state)
    assert np.isfinite(float(m1["loss"]))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="lr_schedule"):
        make_ppo(lr_schedule="nope")


def test_obs_normalization_stats_update():
    venv = make_vec_env("Pendulum-v1", num_envs=4)
    policy = ActorCriticPolicy(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
        normalize_features=True,
    )
    ppo = PPO(venv, policy, PPOConfig(n_steps=32, n_minibatches=4, n_epochs=1))
    state = ppo.init_state()
    count0 = int(state.variables["stats"]["feat_norm"]["count"])
    for _ in range(3):
        state, metrics = ppo._train_step_jit(state)
    count = int(state.variables["stats"]["feat_norm"]["count"])
    assert count == count0 + 3 * 32 * 4
    assert np.isfinite(float(metrics["loss"]))


def test_target_kl_early_stop_triggers():
    """A tiny target_kl halts updates (SB3 semantics: stop once a
    minibatch's approx_kl exceeds 1.5*target_kl)."""
    ppo = make_ppo(target_kl=1e-9, learning_rate=0.05)
    state = ppo.init_state()
    state, metrics = ppo._train_step_jit(state)
    assert float(metrics["early_stop"]) == 1.0


def test_target_kl_loose_matches_disabled():
    """A huge target_kl never triggers: parameters match the
    target_kl=None path exactly under the same seed."""
    outs = []
    for tk in [None, 1e6]:
        ppo = make_ppo(target_kl=tk)
        state = ppo.init_state()
        state, metrics = ppo._train_step_jit(state)
        outs.append(jax.device_get(state.variables["params"]))
        if tk is not None:
            assert float(metrics["early_stop"]) == 0.0
    for a, b in zip(jax.tree.leaves(outs[0]), jax.tree.leaves(outs[1])):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)

"""SAC tests: mechanics + Pendulum learning + replay relabeling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imitation_tpu.envs import make_vec_env
from imitation_tpu.rl.sac import SAC, SACConfig


def make_sac(**cfg):
    venv = make_vec_env("Pendulum-v1", num_envs=4)
    defaults = dict(learning_starts=64, batch_size=64, buffer_size=10_000,
                    actor_hid_sizes=(64, 64), critic_hid_sizes=(64, 64))
    defaults.update(cfg)
    return SAC(venv, SACConfig(**defaults))


def test_sac_step_runs():
    sac = make_sac()
    state = sac.init_state()
    for _ in range(3):
        state, metrics = sac._train_step_jit(state, None)
    for k in ["critic_loss", "actor_loss", "alpha", "entropy"]:
        assert np.isfinite(float(metrics[k])), k


def test_sac_discrete_raises():
    venv = make_vec_env("CartPole-v1", num_envs=2)
    with pytest.raises(ValueError, match="continuous"):
        SAC(venv)


def test_sac_action_scaling():
    """Rollout actions respect Pendulum's [-2, 2] bounds."""
    sac = make_sac()
    state = sac.init_state()
    fn = sac.sample_fn()
    obs = jnp.zeros((8, 3))
    acts, _ = fn({"params": state.actor_params}, obs, jax.random.key(0))
    a = np.asarray(acts)
    assert a.shape == (8, 1)
    assert (np.abs(a) <= 2.0 + 1e-5).all()


def test_sac_relabel_fn_applied():
    calls = {}

    def relabel(reward_params, batch):
        calls["hit"] = True
        return batch.replace(rews=jnp.full_like(batch.rews, reward_params))

    venv = make_vec_env("Pendulum-v1", num_envs=2)
    sac = SAC(
        venv,
        SACConfig(learning_starts=8, batch_size=16, buffer_size=1000,
                  actor_hid_sizes=(32,), critic_hid_sizes=(32,)),
        relabel_fn=relabel,
    )
    state = sac.init_state()
    state, metrics = sac._train_step_jit(state, jnp.asarray(1.5))
    assert calls.get("hit")


@pytest.mark.slow
def test_sac_learns_pendulum():
    sac = make_sac(
        learning_starts=256, batch_size=128, buffer_size=50_000,
        gradient_steps=8, train_freq=2,
    )
    state = sac.init_state(jax.random.key(0))
    returns = []
    for i in range(1500):
        state, metrics = sac._train_step_jit(state, None)
        r = float(metrics["ep_return_mean"])
        if np.isfinite(r):
            returns.append(r)
    early = np.mean(returns[:10])
    late = np.mean(returns[-10:])
    assert late > early + 400, f"SAC failed to learn: {early:.0f} -> {late:.0f}"
    assert late > -1000


def test_sac_host_env_rejected():
    """SAC's collect loop is a device-only lax.scan; host envs get a clear
    error instead of an obscure trace failure."""
    import pytest

    from imitation_tpu.envs.gym_bridge import GymHostEnv, HostVectorEnv
    from imitation_tpu.rl.sac import SAC

    env = GymHostEnv("Pendulum-v1")
    venv = HostVectorEnv(env, num_envs=2, max_episode_steps=10, num_threads=1)
    with pytest.raises(ValueError, match="device .pure-JAX. vector env"):
        SAC(venv)
    venv.close()

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


def test_sac_host_env_path():
    """SAC on a HOST (gym-bridge) env: train_freq steps collected through
    the host collector, then the identical jitted store+update program —
    formerly rejected with a ValueError, now the PPO-style host split.
    Checks round structure (timesteps/updates advance by the configured
    amounts) and that the trained actor rolls out finitely."""
    from imitation_tpu.data import rollout as rmod
    from imitation_tpu.envs.gym_bridge import GymHostEnv, HostVectorEnv
    from imitation_tpu.rl.sac import SAC, SACConfig

    env = GymHostEnv("Pendulum-v1")
    venv = HostVectorEnv(env, num_envs=2, max_episode_steps=20, num_threads=1)
    sac = SAC(
        venv,
        SACConfig(train_freq=4, gradient_steps=8, learning_starts=16,
                  buffer_size=1000, batch_size=32,
                  actor_hid_sizes=(16,), critic_hid_sizes=(16,)),
        seed=0,
    )
    state = sac.init_state()
    assert state.env_state is None  # host path keeps env state on host
    state, metrics = sac._train_step_jit(state, None)
    assert int(state.timesteps) == 4 * 2
    assert int(state.n_updates) == 8
    state = sac.learn(state, 64)
    assert int(state.timesteps) >= 64
    for k in ["critic_loss", "actor_loss", "alpha", "entropy"]:
        assert np.isfinite(float(metrics[k])), k
    trajs = rmod.generate_trajectories(
        sac.policy.sample_fn(), {"params": state.actor_params}, venv,
        rmod.make_min_episodes(2), rng=3,
    )
    assert all(np.isfinite(np.asarray(t.rews)).all() for t in trajs)
    venv.close()


def test_sac_host_env_overlapped():
    """SACConfig.overlap_collection pipelines host stepping with the
    device update: each round joins the background-collected chunk, kicks
    off the next collection under the pre-update actor, and still advances
    timesteps/updates by the configured amounts."""
    from imitation_tpu.envs.gym_bridge import GymHostEnv, HostVectorEnv
    from imitation_tpu.rl.sac import SAC, SACConfig

    env = GymHostEnv("Pendulum-v1")
    venv = HostVectorEnv(env, num_envs=2, max_episode_steps=20, num_threads=1)
    sac = SAC(
        venv,
        SACConfig(train_freq=4, gradient_steps=2, learning_starts=8,
                  buffer_size=1000, batch_size=16,
                  actor_hid_sizes=(16,), critic_hid_sizes=(16,),
                  overlap_collection=True),
        seed=0,
    )
    state = sac.init_state()
    metrics = None
    for _ in range(5):
        state, metrics = sac._train_step_jit(state, None)
    assert sac._pending_chunk is not None
    sac.discard_pending_collection()
    assert sac._pending_chunk is None
    assert int(state.timesteps) == 5 * 4 * 2
    assert int(state.n_updates) == 5 * 2
    for k in ["critic_loss", "actor_loss", "alpha", "entropy"]:
        assert np.isfinite(float(metrics[k])), k

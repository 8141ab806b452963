"""Pipelined host collection (``PPOConfig.overlap_collection``).

The overlapped path joins a background-collected chunk, kicks off the next
collection under the pre-update policy, and dispatches the device update —
host env stepping and chip compute stack instead of serializing
(VERDICT r3 item 4; reference has no equivalent — SB3's collect/update
loop is strictly serial, stable_baselines3 OnPolicyAlgorithm.learn).
"""

import jax
import numpy as np

from imitation_tpu.envs.gym_bridge import GymHostEnv, HostVectorEnv
from imitation_tpu.models.policies import ActorCriticPolicy
from imitation_tpu.rl.ppo import PPO, PPOConfig


def _make(overlap: bool) -> PPO:
    venv = HostVectorEnv(
        GymHostEnv("CartPole-v1"), num_envs=8, max_episode_steps=100,
        num_threads=1,
    )
    policy = ActorCriticPolicy(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
        hid_sizes=(16, 16),
    )
    cfg = PPOConfig(
        n_steps=32, n_minibatches=4, n_epochs=2, overlap_collection=overlap
    )
    return PPO(venv, policy, cfg, seed=0)


def test_overlap_runs_counts_steps_and_discards():
    ppo = _make(True)
    state = ppo.init_state()
    metrics = None
    for _ in range(4):
        state, metrics = ppo._train_step_jit(state, None)[:2]
    # a background collection is in flight after every overlapped step
    assert ppo._pending_chunk is not None
    ppo.discard_pending_collection()
    assert ppo._pending_chunk is None
    host = {k: float(v) for k, v in jax.device_get(metrics).items()}
    assert all(np.isfinite(v) for v in host.values()), host
    assert int(jax.device_get(state.timesteps)) == 4 * 32 * 8


def test_first_iteration_matches_serialized_bitwise():
    # Iteration 0's chunk is collected synchronously with the same params,
    # env seed, and RNG as the serialized path, so the first update must be
    # bit-identical; staleness only begins at iteration 1.
    ppo_s, ppo_o = _make(False), _make(True)
    st_s, st_o = ppo_s.init_state(), ppo_o.init_state()
    st_s, m_s = ppo_s._train_step_jit(st_s, None)[:2]
    st_o, m_o = ppo_o._train_step_jit(st_o, None)[:2]
    ppo_o.discard_pending_collection()
    for (xa, xb) in zip(
        jax.tree.leaves(jax.device_get(st_s.variables)),
        jax.tree.leaves(jax.device_get(st_o.variables)),
    ):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
    m_s, m_o = jax.device_get((m_s, m_o))
    for k in m_s:
        np.testing.assert_array_equal(np.asarray(m_s[k]), np.asarray(m_o[k]))


def test_overlap_learns_cartpole_host():
    # Slightly-stale chunks must still train: 40 overlapped iterations on
    # host CartPole lift the per-chunk mean episode return well above the
    # ~20 a random policy gets on these 256-step chunks.
    ppo = _make(True)
    state = ppo.init_state()
    best = 0.0
    for _ in range(40):
        state, metrics = ppo._train_step_jit(state, None)[:2]
        best = max(best, float(jax.device_get(metrics)["ep_return_mean"]))
    ppo.discard_pending_collection()
    assert best > 35.0, best


def test_phase_timer_records_host_and_device_spans():
    from imitation_tpu.util.profiling import PhaseTimer

    ppo = _make(False)
    ppo.phase_timer = PhaseTimer()
    state = ppo.init_state()
    for _ in range(3):
        state = ppo._train_step_jit(state, None)[0]
    report = ppo.phase_timer.report()
    assert report["time/host_collect_s"] > 0
    assert report["time/device_update_s"] > 0
    # one span per iteration
    assert ppo.phase_timer.totals == {}  # report(reset=True) cleared


def test_phase_timer_overlapped_times_join_only():
    from imitation_tpu.util.profiling import PhaseTimer

    ppo = _make(True)
    ppo.phase_timer = PhaseTimer()
    state = ppo.init_state()
    for _ in range(3):
        state = ppo._train_step_jit(state, None)[0]
    ppo.discard_pending_collection()
    report = ppo.phase_timer.report()
    # first iteration collects synchronously (no pending chunk); the next
    # two join background collections
    assert report["time/collect_join_s"] >= 0
    assert "time/host_collect_s" not in report

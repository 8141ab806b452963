"""Lockstep-batched MuJoCo stepping for the seals benchmark envs.

The reference steps MuJoCo envs one Python ``gym.step`` at a time inside
subprocess workers (reference: src/imitation/util/util.py:163-166). Here the
whole batch advances through MuJoCo's native threaded ``rollout`` module in
ONE host call per policy step — no per-env Python, no GIL in the inner loop.
Observation/reward are computed vectorized in numpy from the batched
physics state, reproducing Gymnasium v5 dynamics with the seals semantics
(fixed horizon, no early termination, positions in observations, v3-era
unconditional healthy_reward — see envs/registry.py).

Because seals envs are fixed-horizon and never terminate early, all envs
reset in lockstep, so batch resets are rare (once per horizon) and fully
vectorized.

seals/Ant takes a sibling path: its observation includes ``cfrc_ext``
(contact forces), a derived quantity not contained in the physics state
that ``mujoco.rollout`` returns — and one whose value is
warmstart-sensitive (degenerate pyramidal contact decompositions), so
only the exact gymnasium substep path reproduces it. Ant therefore keeps
one persistent ``MjData`` per env and advances each with
``mj_step(nstep=frame_skip)`` + ``mj_rnePostConstraint`` (gymnasium's
``_step_mujoco_simulation`` arithmetic, bit-for-bit) across a GIL-released
thread pool — still zero per-env Python inside the physics, still one
vectorized numpy obs/reward computation per policy step.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from imitation_tpu.envs.base import Space

# env_key -> (gymnasium base id, qvel obs clip, unconditional healthy reward)
_SPECS = {
    "seals/HalfCheetah-v0": ("HalfCheetah-v5", None, 0.0),
    "seals/HalfCheetah-v1": ("HalfCheetah-v5", None, 0.0),
    "seals/Hopper-v0": ("Hopper-v5", 10.0, 1.0),
    "seals/Hopper-v1": ("Hopper-v5", 10.0, 1.0),
    "seals/Walker2d-v0": ("Walker2d-v5", 10.0, 1.0),
    "seals/Walker2d-v1": ("Walker2d-v5", 10.0, 1.0),
    "seals/Swimmer-v0": ("Swimmer-v5", None, 0.0),
    "seals/Swimmer-v1": ("Swimmer-v5", None, 0.0),
    "seals/Ant-v0": ("Ant-v5", None, 1.0),
    "seals/Ant-v1": ("Ant-v5", None, 1.0),
}


def supports(env_id: str) -> bool:
    return env_id in _SPECS


class MujocoLockstepVectorEnv:
    """Batched seals MuJoCo envs stepped natively — HostVectorEnv twin.

    Same ``reset/step -> dict`` contract and auto-reset/terminal_obs
    semantics as ``gym_bridge.HostVectorEnv``; the rollout layer treats both
    identically via ``is_host = True``.
    """

    is_host = True

    def __init__(
        self,
        env_id: str,
        num_envs: int = 8,
        max_episode_steps: Optional[int] = None,
        seed: Optional[int] = None,
        num_threads: Optional[int] = None,
    ):
        import gymnasium as gym
        import mujoco
        from mujoco import rollout as mj_rollout

        base_id, qvel_clip, healthy = _SPECS[env_id]
        self.env_id = env_id
        self.num_envs = num_envs
        self._mujoco = mujoco
        # Ant: cfrc_ext in obs + contact cost in reward (gymnasium ant_v5
        # _get_obs/_get_rew); needs the per-env persistent-MjData path.
        self._has_cfrc = base_id.startswith("Ant")

        # Template env supplies the model, spaces, reward weights, and
        # reset-noise scale — guaranteed in sync with Gymnasium v5.
        tmpl = gym.make(
            base_id, exclude_current_positions_from_observation=False
        ).unwrapped
        self._model = tmpl.model
        self._frame_skip = int(tmpl.frame_skip)
        self._dt = float(tmpl.dt)
        self._fwd_w = float(tmpl._forward_reward_weight)
        self._ctrl_w = float(tmpl._ctrl_cost_weight)
        self._noise = float(tmpl._reset_noise_scale)
        if self._has_cfrc:
            self._contact_w = float(tmpl._contact_cost_weight)
            self._contact_lo, self._contact_hi = map(
                float, tmpl._contact_force_range
            )
        # HalfCheetah and Ant draw qvel noise from a normal; the other three
        # families draw uniform (gymnasium mujoco/*_v5.py reset_model).
        self._qvel_noise_normal = base_id.startswith(("HalfCheetah", "Ant"))
        self._init_qpos = np.asarray(tmpl.init_qpos, np.float64).copy()
        self._init_qvel = np.asarray(tmpl.init_qvel, np.float64).copy()
        self._obs_space = Space.from_gym(tmpl.observation_space)
        self._act_space = Space.from_gym(tmpl.action_space)
        self.max_episode_steps = int(
            max_episode_steps or gym.spec(base_id).max_episode_steps
        )
        self._qvel_clip = qvel_clip
        self._healthy = healthy
        tmpl.close()

        self._nq = self._model.nq
        self._nv = self._model.nv
        self._nu = self._model.nu
        self._nstate = mujoco.mj_stateSize(
            self._model, mujoco.mjtState.mjSTATE_FULLPHYSICS
        )
        assert self._nstate == 1 + self._nq + self._nv, (
            f"{env_id}: FULLPHYSICS state has actuator/plugin state; "
            "lockstep path assumes state = [time, qpos, qvel]"
        )

        import os

        nthread = num_threads or min(num_envs, os.cpu_count() or 1)
        self._states = np.zeros((num_envs, self._nstate), np.float64)
        if self._has_cfrc:
            # Persistent MjData per env, stepped with the exact gymnasium
            # substep arithmetic (mj_step(nstep) + mj_rnePostConstraint) in
            # GIL-released threads: cfrc_ext is warmstart-sensitive, so only
            # this path is bit-identical to gym. mujoco physics calls release
            # the GIL, so a thread pool gives rollout-module parallelism.
            from concurrent.futures import ThreadPoolExecutor

            self._pool = None
            self._env_datas = [
                mujoco.MjData(self._model) for _ in range(num_envs)
            ]
            self._nthread = nthread
            self._tp = ThreadPoolExecutor(max_workers=nthread)
            self._nbody = self._model.nbody
            self._cfrc = np.zeros((num_envs, self._nbody, 6), np.float64)
            # gymnasium ant_v5 computes dx from body(main_body=1).xpos, which
            # is the kinematics of the LAST substep's qpos (mj_step integrates
            # after the forward pass) — not the final qpos. Track it exactly.
            self._xpos_x = np.zeros(num_envs, np.float64)
        else:
            self._pool = mj_rollout.Rollout(nthread=nthread)
            self._datas = [mujoco.MjData(self._model) for _ in range(nthread)]
            # skip_checks fast path wants model as a length-nbatch list
            self._models = [self._model] * num_envs
            # preallocated outputs: [B, frame_skip, nstate]
            self._state_out = np.zeros(
                (num_envs, self._frame_skip, self._nstate), np.float64
            )
            self._ctrl = np.zeros(
                (num_envs, self._frame_skip, self._nu), np.float64
            )
        self._t = 0
        self._ep_ret = np.zeros(num_envs, np.float64)
        self._rng = np.random.default_rng(seed if seed is not None else 0)

    @property
    def observation_space(self) -> Space:
        return self._obs_space

    @property
    def action_space(self) -> Space:
        return self._act_space

    # -- state <-> obs ------------------------------------------------------

    def _obs(self) -> np.ndarray:
        qpos = self._states[:, 1 : 1 + self._nq]
        qvel = self._states[:, 1 + self._nq :]
        if self._qvel_clip is not None:
            qvel = np.clip(qvel, -self._qvel_clip, self._qvel_clip)
        parts = [qpos, qvel]
        if self._has_cfrc:
            # gymnasium ant_v5._get_obs: clipped cfrc_ext, world body dropped
            cf = np.clip(self._cfrc, self._contact_lo, self._contact_hi)
            parts.append(cf[:, 1:, :].reshape(self.num_envs, -1))
        return np.concatenate(parts, axis=1)

    def _reset_states(self) -> None:
        B = self.num_envs
        qpos = self._init_qpos + self._rng.uniform(
            -self._noise, self._noise, size=(B, self._nq)
        )
        if self._qvel_noise_normal:
            qvel = self._init_qvel + self._noise * self._rng.standard_normal(
                (B, self._nv)
            )
        else:
            qvel = self._init_qvel + self._rng.uniform(
                -self._noise, self._noise, size=(B, self._nv)
            )
        self._states[:, 0] = 0.0
        self._states[:, 1 : 1 + self._nq] = qpos
        self._states[:, 1 + self._nq :] = qvel
        self._t = 0
        self._ep_ret[:] = 0.0
        if self._has_cfrc:
            # Exactly gymnasium MujocoEnv.reset: mj_resetData (zeroes ctrl,
            # warmstart, cfrc_ext) then set_state = qpos/qvel + mj_forward
            # (which does NOT recompute cfrc_ext -> reset obs cfrc is zero).
            mujoco = self._mujoco

            def _do_reset(i):
                d = self._env_datas[i]
                mujoco.mj_resetData(self._model, d)
                d.qpos[:] = qpos[i]
                d.qvel[:] = qvel[i]
                mujoco.mj_forward(self._model, d)
                self._xpos_x[i] = d.xpos[1, 0]

            list(self._tp.map(_do_reset, range(self.num_envs)))
            self._cfrc[:] = 0.0

    def reset(self, seed: Optional[int] = None) -> np.ndarray:
        if seed is not None:
            self._rng = np.random.default_rng(seed)
        self._reset_states()
        return self._obs()

    def step(self, actions: np.ndarray):
        acts = np.asarray(actions, np.float64)
        x_before = (
            self._xpos_x.copy() if self._has_cfrc
            else self._states[:, 1].copy()
        )
        if self._has_cfrc:
            # Ant path: exact gymnasium _step_mujoco_simulation arithmetic
            # (mj_step(nstep=frame_skip) then mj_rnePostConstraint) per env,
            # across GIL-released threads; cfrc_ext captured for obs+reward.
            mujoco = self._mujoco
            model = self._model
            nq, fs = self._nq, self._frame_skip

            # One task per worker thread, env loop inside: per-task executor
            # dispatch dominates at 2 vCPUs (measured 1.84x from chunking —
            # mj_step releases the GIL, so the physics still overlaps).
            def _do_chunk(bounds):
                lo, hi = bounds
                for i in range(lo, hi):
                    d = self._env_datas[i]
                    d.ctrl[:] = acts[i]
                    mujoco.mj_step(model, d, nstep=fs)
                    mujoco.mj_rnePostConstraint(model, d)
                    self._states[i, 0] = d.time
                    self._states[i, 1 : 1 + nq] = d.qpos
                    self._states[i, 1 + nq :] = d.qvel
                    self._cfrc[i] = d.cfrc_ext
                    self._xpos_x[i] = d.xpos[1, 0]

            nw = self._nthread
            n = self.num_envs
            bounds = [(k * n // nw, (k + 1) * n // nw) for k in range(nw)]
            list(self._tp.map(_do_chunk, bounds))
        else:
            self._ctrl[:] = acts[:, None, :]
            self._pool.rollout(
                self._models,
                self._datas,
                self._states,
                control=self._ctrl,
                nstep=self._frame_skip,
                state=self._state_out,
                skip_checks=True,
            )
            self._states[:] = self._state_out[:, -1, :]
        x_after = self._xpos_x if self._has_cfrc else self._states[:, 1]

        # Gymnasium v5 reward with seals-compat unconditional healthy_reward
        # (registry._make_seals_reward_compat): forward velocity minus
        # control cost, plus flat survival bonus.
        reward = (
            self._fwd_w * (x_after - x_before) / self._dt
            - self._ctrl_w * np.sum(np.square(acts), axis=1)
            + self._healthy
        )
        if self._has_cfrc:
            # gymnasium ant_v5 contact_cost: weight * sum(clipped cfrc_ext^2)
            # over ALL bodies (world rows are zero, so clipping keeps them 0).
            cf = np.clip(self._cfrc, self._contact_lo, self._contact_hi)
            reward -= self._contact_w * np.sum(np.square(cf), axis=(1, 2))
        self._t += 1
        self._ep_ret += reward

        obs = self._obs()
        done = self._t >= self.max_episode_steps
        B = self.num_envs
        truncated = np.full(B, done, bool)
        ep_ret = self._ep_ret.astype(np.float32)
        ep_len = np.full(B, self._t, np.int32)
        terminal_obs = obs
        if done:
            self._reset_states()
            obs = self._obs()
        return dict(
            obs=obs,
            terminal_obs=terminal_obs,
            reward=reward.astype(np.float32),
            terminated=np.zeros(B, bool),
            truncated=truncated,
            episode_return=ep_ret,
            episode_length=ep_len,
        )

    def close(self):
        if self._pool is not None:
            self._pool.close()
        if self._has_cfrc:
            self._tp.shutdown(wait=False)

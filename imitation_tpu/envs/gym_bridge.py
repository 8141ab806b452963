"""Host-environment bridge: run arbitrary Gymnasium envs behind the
VectorEnv interface.

Pure-JAX envs run fully on-device; anything else (MuJoCo, Atari, custom
Python envs) steps on the host through this bridge — the analogue of the
reference's ``DummyVecEnv``/``SubprocVecEnv`` + ``Monitor`` stack
(reference: src/imitation/util/util.py:80-166), but batched behind the same
``reset/step -> VecStep`` contract as the device engine, so rollout code is
agnostic. Stepping happens in one numpy-batched host call per step (the
rollout driver switches to a host loop with a jitted policy apply — see
data/rollout collect_host).

Auto-reset + terminal_observation + monitor-return semantics are identical to
the device engine (and to SB3's VecEnv, reward_wrapper.py:93-109).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np

from imitation_tpu.envs.base import Env, Space


class GymHostEnv(Env):
    """A host Gymnasium env factory wrapped as an Env descriptor.

    Not steppable under jit — ``HostVectorEnv`` (below) provides the
    vectorized interface. Construction validates the env id eagerly.
    """

    def __init__(self, env_id: str, post_wrappers=None, **make_kwargs):
        import gymnasium as gym

        if env_id not in gym.registry:
            raise KeyError(f"unknown gymnasium env {env_id!r}")
        self.env_id = env_id
        self.post_wrappers = list(post_wrappers or [])
        self.make_kwargs = make_kwargs
        spec = gym.spec(env_id)
        self.max_episode_steps = spec.max_episode_steps
        probe = gym.make(env_id, **make_kwargs)
        self._obs_space = Space.from_gym(probe.observation_space)
        self._act_space = Space.from_gym(probe.action_space)
        probe.close()

    @property
    def observation_space(self) -> Space:
        return self._obs_space

    @property
    def action_space(self) -> Space:
        return self._act_space

    def make(self):
        import gymnasium as gym

        env = gym.make(self.env_id, **self.make_kwargs)
        for wrap in self.post_wrappers:
            env = wrap(env)
        return env

    def reset(self, key):
        raise TypeError(
            f"{self.env_id} is a host env; wrap it in HostVectorEnv "
            "instead of calling reset/step directly",
        )

    step = reset

    @property
    def name(self) -> str:
        return self.env_id


class HostVectorEnv:
    """Vectorized host envs with auto-reset — numpy twin of VectorEnv.

    ``reset``/``step`` mirror ``VectorEnv`` but take/return numpy and are
    NOT jit-able; the rollout layer detects this via ``is_host = True``.
    """

    is_host = True

    def __init__(
        self,
        env: GymHostEnv,
        num_envs: int = 8,
        max_episode_steps: Optional[int] = None,
        seed: Optional[int] = None,
        num_threads: Optional[int] = None,
    ):
        self.env = env
        self.num_envs = num_envs
        self.max_episode_steps = max_episode_steps or env.max_episode_steps
        self._envs = [env.make() for _ in range(num_envs)]
        self._seed = seed if seed is not None else 0
        self._t = np.zeros(num_envs, np.int32)
        self._ep_ret = np.zeros(num_envs, np.float64)
        # Thread pool replaces the reference's SubprocVecEnv worker processes
        # (util/util.py:163-166): native env cores (MuJoCo) release the GIL
        # during mj_step, so threads give process-level parallelism without
        # pipes or pickling.
        self._pool = None
        if num_threads is None:
            import os

            num_threads = min(num_envs, os.cpu_count() or 1)
        self._num_threads = max(1, num_threads)
        if num_threads > 1 and num_envs > 1:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=num_threads)
            # One task per WORKER, not per env: each worker steps a
            # contiguous slice of envs, so per-step pool overhead is
            # O(threads) instead of O(envs) — matters at 64+ envs on a
            # small host.
            bounds = np.linspace(0, num_envs, self._num_threads + 1).astype(int)
            self._chunks = [
                (int(bounds[i]), int(bounds[i + 1]))
                for i in range(self._num_threads)
                if bounds[i] < bounds[i + 1]
            ]

    @property
    def observation_space(self) -> Space:
        return self.env.observation_space

    @property
    def action_space(self) -> Space:
        return self.env.action_space

    def reset(self, seed: Optional[int] = None) -> np.ndarray:
        if seed is not None:
            self._seed = seed
        obs = []
        for i, e in enumerate(self._envs):
            o, _ = e.reset(seed=self._seed + i)
            obs.append(o)
        self._t[:] = 0
        self._ep_ret[:] = 0
        return np.stack(obs)

    def _step_one(self, i: int, action) -> tuple:
        e = self._envs[i]
        o, r, term, trunc, info = e.step(np.asarray(action))
        self._t[i] += 1
        self._ep_ret[i] += float(r)
        if self.max_episode_steps is not None and self._t[i] >= self.max_episode_steps:
            trunc = trunc or not term
        term_o = o
        ep_ret, ep_len = self._ep_ret[i], self._t[i]
        if term or trunc:
            o, _ = e.reset()
            self._t[i] = 0
            self._ep_ret[i] = 0
        return o, term_o, r, term, trunc, ep_ret, ep_len

    def _step_slice(self, lo: int, hi: int, actions) -> list:
        return [self._step_one(i, actions[i]) for i in range(lo, hi)]

    def step(self, actions: np.ndarray):
        """Returns dict with same fields as VecStep (numpy)."""
        B = self.num_envs
        if self._pool is not None:
            futs = [
                self._pool.submit(self._step_slice, lo, hi, actions)
                for lo, hi in self._chunks
            ]
            results = [r for f in futs for r in f.result()]
        else:
            results = [self._step_one(i, actions[i]) for i in range(B)]
        obs, term_obs, rew, term, trunc, ep_ret, ep_len = zip(*results)
        return dict(
            obs=np.stack(obs),
            terminal_obs=np.stack(term_obs),
            reward=np.asarray(rew, np.float32),
            terminated=np.asarray(term, bool),
            truncated=np.asarray(trunc, bool),
            episode_return=np.asarray(ep_ret, np.float32),
            episode_length=np.asarray(ep_len, np.int32),
        )

    def close(self):
        if self._pool is not None:
            self._pool.shutdown()
        for e in self._envs:
            e.close()

"""Environment wrappers: transition buffering and rollout-info recording.

Counterpart of reference ``data/wrappers.py``:

* ``BufferingWrapper`` (reference :13-169) — records every transition flowing
  through a vector env; pop as trajectories or transitions; errors on reset
  with un-popped samples.
* ``RolloutInfoWrapper`` (reference :172-208) — stashes full-episode obs/rews
  into ``info["rollout"]`` at episode end.

In the TPU engine these concerns are handled natively: the rollout scan
*returns* every transition (nothing to buffer) and the vector engine tracks
monitor stats. These host-side classes exist for the gym-bridge path
(``HostVectorEnv``) and for API parity when wrapping external envs.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from imitation_tpu.data import rollout as rollout_mod
from imitation_tpu.data import types
from imitation_tpu.envs.gym_bridge import HostVectorEnv


class BufferingWrapper:
    """Saves transitions stepped through a HostVectorEnv (reference :13-169)."""

    def __init__(self, venv: HostVectorEnv, error_on_premature_reset: bool = True):
        self.venv = venv
        self.error_on_premature_reset = error_on_premature_reset
        self._accum: Optional[rollout_mod.TrajectoryAccumulator] = None
        self._trajectories: List[types.TrajectoryWithRew] = []
        self._init_reset = False
        self._n_transitions: Optional[int] = None
        self._last_obs = None

    @property
    def num_envs(self) -> int:
        return self.venv.num_envs

    @property
    def n_transitions(self) -> Optional[int]:
        return self._n_transitions

    def reset(self, **kwargs) -> np.ndarray:
        if (
            self._init_reset
            and self.error_on_premature_reset
            and self._n_transitions
        ):
            raise RuntimeError("BufferingWrapper reset() before samples were accessed")
        self._init_reset = True
        self._n_transitions = 0
        self._trajectories = []
        self._accum = rollout_mod.TrajectoryAccumulator(self.venv.num_envs)
        obs = self.venv.reset(**kwargs)
        self._last_obs = obs
        return obs

    def step(self, actions: np.ndarray):
        assert self._init_reset, "call reset() first"
        out = self.venv.step(actions)
        for i in range(self.venv.num_envs):
            self._accum.add_step(
                i,
                dict(
                    obs=self._last_obs[i],
                    acts=np.asarray(actions[i]),
                    rews=out["reward"][i],
                    next_obs=out["terminal_obs"][i],
                ),
            )
            if out["terminated"][i] or out["truncated"][i]:
                self._trajectories.append(
                    self._accum.finish_trajectory(i, bool(out["terminated"][i]))
                )
        self._last_obs = out["obs"]
        self._n_transitions += self.venv.num_envs
        return out

    def pop_finished_trajectories(self) -> Sequence[types.TrajectoryWithRew]:
        out = self._trajectories
        self._trajectories = []
        finished_steps = sum(len(t) for t in out)
        self._n_transitions -= finished_steps
        return out

    def pop_trajectories(self) -> Sequence[types.TrajectoryWithRew]:
        """Pops all, including in-progress partial trajectories."""
        finished = list(self.pop_finished_trajectories())
        for i in range(self.venv.num_envs):
            if self._accum.partial[i]:
                finished.append(self._accum.finish_trajectory(i, terminal=False))
        self._n_transitions = 0
        return finished

    def pop_transitions(self) -> types.TransitionsWithRew:
        before = self._n_transitions
        trajs = self.pop_trajectories()
        transitions = rollout_mod.flatten_trajectories_with_rew(trajs)
        assert len(transitions) == before
        return transitions


class RolloutInfoWrapper:
    """Per-env gym wrapper stashing full-episode data in infos
    (reference :172-208). For host gymnasium envs."""

    def __init__(self, env):
        self.env = env
        self._obs = None
        self._rews = None

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self, **kwargs):
        new_obs, info = self.env.reset(**kwargs)
        self._obs = [new_obs]
        self._rews = []
        return new_obs, info

    def step(self, action):
        obs, rew, terminated, truncated, info = self.env.step(action)
        done = terminated or truncated
        self._obs.append(obs)
        self._rews.append(rew)
        if done:
            assert "rollout" not in info
            info["rollout"] = {
                "obs": np.stack(self._obs),
                "rews": np.stack(self._rews),
                "monitor_return": float(np.sum(self._rews)),
            }
        return obs, rew, terminated, truncated, info

"""Environment registry: name -> pure-JAX Env factory.

Mirrors the role of Gymnasium's registry as used by the reference's
``util.make_vec_env`` (reference: src/imitation/util/util.py:80-166). Names
follow gym ids; ``seals/...`` ids map to fixed-horizon variants (the seals
package's defining change — reference depends on seals for exactly this,
setup.py:205).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

from imitation_tpu.envs import classic
from imitation_tpu.envs.base import Env
from imitation_tpu.envs.vector import VectorEnv

_REGISTRY: Dict[str, Callable[[], Env]] = {}


def register(name: str, factory: Callable[[], Env]) -> None:
    if name in _REGISTRY:
        raise ValueError(f"env {name!r} already registered")
    _REGISTRY[name] = factory


def registered_envs():
    return sorted(_REGISTRY)


def make_env(name: str, **kwargs) -> Env:
    if name not in _REGISTRY:
        # Fall back to the host gym bridge for anything gymnasium knows
        # (e.g. MuJoCo envs) — stepped on host via io_callback.
        from imitation_tpu.envs.gym_bridge import GymHostEnv

        try:
            return GymHostEnv(name, **kwargs)
        except Exception as e:
            raise KeyError(
                f"unknown env {name!r}; registered: {registered_envs()}"
            ) from e
    return _REGISTRY[name](**kwargs)


def make_vec_env(
    name: str,
    num_envs: int = 8,
    max_episode_steps: Optional[int] = None,
    **env_kwargs,
) -> VectorEnv:
    """Builds a VectorEnv — equivalent of reference ``util.make_vec_env``.

    The reference default is 8 subprocess envs (reference:
    src/imitation/scripts/ingredients/environment.py:17-18); here ``num_envs``
    is just a leading batch dimension, so thousands are as cheap as eight.
    """
    use_lockstep = env_kwargs.pop("lockstep", True)
    if use_lockstep and not env_kwargs:
        from imitation_tpu.envs import mujoco_native

        if mujoco_native.supports(name):
            # Fixed-horizon seals MuJoCo: batch-stepped through MuJoCo's
            # native threaded rollout (no per-env Python) — ~3x the
            # per-env gym-bridge path. Pass lockstep=False to force the
            # bridge.
            return mujoco_native.MujocoLockstepVectorEnv(
                name, num_envs=num_envs, max_episode_steps=max_episode_steps
            )
    env = make_env(name, **env_kwargs)
    from imitation_tpu.envs.gym_bridge import GymHostEnv, HostVectorEnv

    if isinstance(env, GymHostEnv):
        return HostVectorEnv(env, num_envs=num_envs, max_episode_steps=max_episode_steps)
    return VectorEnv(env, num_envs=num_envs, max_episode_steps=max_episode_steps)


register("CartPole-v0", lambda **kw: _with_horizon(classic.CartPole(**kw), 200))
register("CartPole-v1", classic.CartPole)
register("Pendulum-v1", classic.Pendulum)
register("MountainCar-v0", classic.MountainCar)
register("MountainCarContinuous-v0", classic.MountainCarContinuous)
register("Acrobot-v1", classic.Acrobot)
register("seals/CartPole-v0", lambda **kw: classic.CartPole(fixed_horizon=True, **kw))
register("seals/MountainCar-v0", lambda **kw: classic.MountainCar(fixed_horizon=True, **kw))
register("seals/Pendulum-v0", classic.Pendulum)  # Pendulum is already fixed-horizon


def _with_horizon(env: Env, horizon: int) -> Env:
    env.max_episode_steps = horizon
    return env


# seals-style MuJoCo envs (the reference benchmark matrix:
# benchmarking/README.md:3-6 — ant, half_cheetah, hopper, swimmer, walker).
# seals' defining changes vs plain gym MuJoCo: fixed horizon (no early
# termination) and positions included in observations. Stepped on host
# through the gym bridge (MuJoCo's C core, GIL-releasing threads).
def _make_seals_reward_compat(healthy_reward: float):
    """v3-era reward semantics for seals envs on Gymnasium v5 MuJoCo.

    seals pins gym envs whose ``healthy_reward`` was paid on EVERY step when
    ``terminate_when_unhealthy=False`` (the pre-v5 behavior; Gymnasium fixed
    it in v5 — see hopper_v5.py "Fixed bug: healthy_reward was given on every
    step"). The reference's published benchmark returns (BASELINE.md) are in
    those units; this wrapper adds the withheld healthy_reward back on
    unhealthy steps so returns are directly comparable.
    """
    import gymnasium as gym

    class SealsRewardCompat(gym.Wrapper):
        def step(self, action):
            obs, rew, term, trunc, info = self.env.step(action)
            survive = info.get("reward_survive", healthy_reward)
            rew = rew + (healthy_reward - survive)
            return obs, rew, term, trunc, info

    return SealsRewardCompat


def _register_seals_mujoco():
    import functools

    unhealthy_ok = {"terminate_when_unhealthy": False}
    specs = {
        "seals/HalfCheetah-v0": ("HalfCheetah-v5", {}, None),
        "seals/HalfCheetah-v1": ("HalfCheetah-v5", {}, None),
        "seals/Ant-v0": ("Ant-v5", unhealthy_ok, 1.0),
        "seals/Ant-v1": ("Ant-v5", unhealthy_ok, 1.0),
        "seals/Hopper-v0": ("Hopper-v5", unhealthy_ok, 1.0),
        "seals/Hopper-v1": ("Hopper-v5", unhealthy_ok, 1.0),
        "seals/Walker2d-v0": ("Walker2d-v5", unhealthy_ok, 1.0),
        "seals/Walker2d-v1": ("Walker2d-v5", unhealthy_ok, 1.0),
        "seals/Swimmer-v0": ("Swimmer-v5", {}, None),
        "seals/Swimmer-v1": ("Swimmer-v5", {}, None),
    }

    def factory(base_id, base_kwargs, healthy_reward, **kw):
        from imitation_tpu.envs.gym_bridge import GymHostEnv

        kwargs = {
            "exclude_current_positions_from_observation": False,
            **base_kwargs,
            **kw,
        }
        post = []
        if healthy_reward is not None:
            post.append(_make_seals_reward_compat(healthy_reward))
        return GymHostEnv(base_id, post_wrappers=post, **kwargs)

    for name, (base_id, base_kwargs, healthy) in specs.items():
        register(name, functools.partial(factory, base_id, base_kwargs, healthy))


_register_seals_mujoco()

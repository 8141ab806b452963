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
def _register_seals_mujoco():
    import functools

    specs = {
        "seals/HalfCheetah-v0": ("HalfCheetah-v5", {}),
        "seals/HalfCheetah-v1": ("HalfCheetah-v5", {}),
        "seals/Ant-v0": ("Ant-v5", {"terminate_when_unhealthy": False}),
        "seals/Ant-v1": ("Ant-v5", {"terminate_when_unhealthy": False}),
        "seals/Hopper-v0": ("Hopper-v5", {"terminate_when_unhealthy": False}),
        "seals/Hopper-v1": ("Hopper-v5", {"terminate_when_unhealthy": False}),
        "seals/Walker2d-v0": ("Walker2d-v5", {"terminate_when_unhealthy": False}),
        "seals/Walker2d-v1": ("Walker2d-v5", {"terminate_when_unhealthy": False}),
        "seals/Swimmer-v0": ("Swimmer-v5", {}),
        "seals/Swimmer-v1": ("Swimmer-v5", {}),
    }

    def factory(base_id, base_kwargs, **kw):
        from imitation_tpu.envs.gym_bridge import GymHostEnv

        kwargs = {
            "exclude_current_positions_from_observation": False,
            **base_kwargs,
            **kw,
        }
        return GymHostEnv(base_id, **kwargs)

    for name, (base_id, base_kwargs) in specs.items():
        register(name, functools.partial(factory, base_id, base_kwargs))


_register_seals_mujoco()

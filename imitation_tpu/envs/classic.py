"""Pure-JAX classic-control environments.

Dynamics follow Gymnasium's classic_control implementations step-for-step so
that returns are directly comparable with the reference library's benchmarks
(the reference steps these envs on host CPUs through SB3 VecEnvs; here each is
a pure function vmappable over thousands of instances on a TPU core).

Each env also has a fixed-horizon "seals-style" variant via
``fixed_horizon=True``: early termination is disabled and episodes always run
to the time limit — the reference requires fixed-horizon envs for most
algorithms because variable horizons leak reward information
(reference: src/imitation/algorithms/base.py:77-110, docs on variable horizon).
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from imitation_tpu.envs.base import Env, Space, TimeStep


@struct.dataclass
class ArrayState:
    x: jnp.ndarray


class CartPole(Env):
    """CartPole-v1 dynamics (Euler integration).

    Matches gymnasium.envs.classic_control.cartpole: gravity 9.8, cart mass
    1.0, pole mass 0.1, half-length 0.5, force 10, tau 0.02; terminates at
    |x|>2.4 or |theta|>12deg; reward 1 per step; horizon 500.
    """

    max_episode_steps = 500

    def __init__(self, fixed_horizon: bool = False):
        self.fixed_horizon = fixed_horizon
        self.gravity = 9.8
        self.masscart = 1.0
        self.masspole = 0.1
        self.total_mass = self.masscart + self.masspole
        self.length = 0.5
        self.polemass_length = self.masspole * self.length
        self.force_mag = 10.0
        self.tau = 0.02
        self.theta_threshold = 12 * 2 * math.pi / 360
        self.x_threshold = 2.4

    @property
    def observation_space(self) -> Space:
        high = np.array(
            [self.x_threshold * 2, np.finfo(np.float32).max,
             self.theta_threshold * 2, np.finfo(np.float32).max],
            dtype=np.float32,
        )
        return Space.box(-high, high, (4,))

    @property
    def action_space(self) -> Space:
        return Space.discrete(2)

    def reset(self, key: jax.Array) -> Tuple[jnp.ndarray, ArrayState]:
        x = jax.random.uniform(key, (4,), minval=-0.05, maxval=0.05)
        return x, ArrayState(x=x)

    def obs_of(self, state: ArrayState) -> jnp.ndarray:
        return state.x

    def step(self, state: ArrayState, action, key) -> Tuple[ArrayState, TimeStep]:
        x, x_dot, theta, theta_dot = state.x
        force = jnp.where(action == 1, self.force_mag, -self.force_mag)
        costheta = jnp.cos(theta)
        sintheta = jnp.sin(theta)
        temp = (force + self.polemass_length * theta_dot**2 * sintheta) / self.total_mass
        thetaacc = (self.gravity * sintheta - costheta * temp) / (
            self.length * (4.0 / 3.0 - self.masspole * costheta**2 / self.total_mass)
        )
        xacc = temp - self.polemass_length * thetaacc * costheta / self.total_mass
        x = x + self.tau * x_dot
        x_dot = x_dot + self.tau * xacc
        theta = theta + self.tau * theta_dot
        theta_dot = theta_dot + self.tau * thetaacc
        new = jnp.stack([x, x_dot, theta, theta_dot])
        terminated = (
            (jnp.abs(x) > self.x_threshold) | (jnp.abs(theta) > self.theta_threshold)
        )
        if self.fixed_horizon:
            terminated = jnp.zeros_like(terminated)
        return ArrayState(x=new), TimeStep(
            obs=new,
            reward=jnp.float32(1.0),
            terminated=terminated,
            truncated=jnp.zeros_like(terminated),
        )


class Pendulum(Env):
    """Pendulum-v1 dynamics. Horizon 200; never terminates early."""

    max_episode_steps = 200

    def __init__(self, fixed_horizon: bool = True):
        self.max_speed = 8.0
        self.max_torque = 2.0
        self.dt = 0.05
        self.g = 10.0
        self.m = 1.0
        self.l = 1.0

    @property
    def observation_space(self) -> Space:
        high = np.array([1.0, 1.0, self.max_speed], dtype=np.float32)
        return Space.box(-high, high, (3,))

    @property
    def action_space(self) -> Space:
        return Space.box(-self.max_torque, self.max_torque, (1,))

    def reset(self, key: jax.Array):
        k1, k2 = jax.random.split(key)
        th = jax.random.uniform(k1, (), minval=-jnp.pi, maxval=jnp.pi)
        thdot = jax.random.uniform(k2, (), minval=-1.0, maxval=1.0)
        state = ArrayState(x=jnp.stack([th, thdot]))
        return self.obs_of(state), state

    def obs_of(self, state: ArrayState) -> jnp.ndarray:
        th, thdot = state.x
        return jnp.stack([jnp.cos(th), jnp.sin(th), thdot])

    def step(self, state: ArrayState, action, key):
        th, thdot = state.x
        u = jnp.clip(action, -self.max_torque, self.max_torque).reshape(())
        angle_norm = ((th + jnp.pi) % (2 * jnp.pi)) - jnp.pi
        cost = angle_norm**2 + 0.1 * thdot**2 + 0.001 * u**2
        newthdot = thdot + (
            3.0 * self.g / (2.0 * self.l) * jnp.sin(th)
            + 3.0 / (self.m * self.l**2) * u
        ) * self.dt
        newthdot = jnp.clip(newthdot, -self.max_speed, self.max_speed)
        newth = th + newthdot * self.dt
        new_state = ArrayState(x=jnp.stack([newth, newthdot]))
        f = jnp.zeros((), dtype=bool)
        return new_state, TimeStep(
            obs=self.obs_of(new_state),
            reward=-cost,
            terminated=f,
            truncated=f,
        )


class MountainCar(Env):
    """MountainCar-v0 dynamics (discrete). Horizon 200."""

    max_episode_steps = 200

    def __init__(self, fixed_horizon: bool = False):
        self.fixed_horizon = fixed_horizon
        self.min_position = -1.2
        self.max_position = 0.6
        self.max_speed = 0.07
        self.goal_position = 0.5
        self.force = 0.001
        self.gravity = 0.0025

    @property
    def observation_space(self) -> Space:
        low = np.array([self.min_position, -self.max_speed], dtype=np.float32)
        high = np.array([self.max_position, self.max_speed], dtype=np.float32)
        return Space.box(low, high, (2,))

    @property
    def action_space(self) -> Space:
        return Space.discrete(3)

    def reset(self, key: jax.Array):
        pos = jax.random.uniform(key, (), minval=-0.6, maxval=-0.4)
        state = ArrayState(x=jnp.stack([pos, jnp.zeros(())]))
        return state.x, state

    def obs_of(self, state: ArrayState) -> jnp.ndarray:
        return state.x

    def step(self, state: ArrayState, action, key):
        position, velocity = state.x
        velocity = velocity + (action - 1) * self.force + jnp.cos(3 * position) * (-self.gravity)
        velocity = jnp.clip(velocity, -self.max_speed, self.max_speed)
        position = jnp.clip(position + velocity, self.min_position, self.max_position)
        velocity = jnp.where((position == self.min_position) & (velocity < 0), 0.0, velocity)
        terminated = (position >= self.goal_position) & (velocity >= 0.0)
        if self.fixed_horizon:
            terminated = jnp.zeros_like(terminated)
        new = jnp.stack([position, velocity])
        return ArrayState(x=new), TimeStep(
            obs=new,
            reward=jnp.float32(-1.0),
            terminated=terminated,
            truncated=jnp.zeros_like(terminated),
        )


class MountainCarContinuous(Env):
    """MountainCarContinuous-v0 dynamics. Horizon 999."""

    max_episode_steps = 999

    def __init__(self, fixed_horizon: bool = False):
        self.fixed_horizon = fixed_horizon
        self.min_position = -1.2
        self.max_position = 0.6
        self.max_speed = 0.07
        self.goal_position = 0.45
        self.power = 0.0015

    @property
    def observation_space(self) -> Space:
        low = np.array([self.min_position, -self.max_speed], dtype=np.float32)
        high = np.array([self.max_position, self.max_speed], dtype=np.float32)
        return Space.box(low, high, (2,))

    @property
    def action_space(self) -> Space:
        return Space.box(-1.0, 1.0, (1,))

    def reset(self, key: jax.Array):
        pos = jax.random.uniform(key, (), minval=-0.6, maxval=-0.4)
        state = ArrayState(x=jnp.stack([pos, jnp.zeros(())]))
        return state.x, state

    def obs_of(self, state: ArrayState) -> jnp.ndarray:
        return state.x

    def step(self, state: ArrayState, action, key):
        position, velocity = state.x
        force = jnp.clip(action.reshape(()), -1.0, 1.0)
        velocity = velocity + force * self.power - 0.0025 * jnp.cos(3 * position)
        velocity = jnp.clip(velocity, -self.max_speed, self.max_speed)
        position = jnp.clip(position + velocity, self.min_position, self.max_position)
        velocity = jnp.where((position == self.min_position) & (velocity < 0), 0.0, velocity)
        terminated = (position >= self.goal_position) & (velocity >= 0.0)
        if self.fixed_horizon:
            terminated = jnp.zeros_like(terminated)
        reward = jnp.where(terminated, 100.0, 0.0) - 0.1 * force**2
        new = jnp.stack([position, velocity])
        return ArrayState(x=new), TimeStep(
            obs=new,
            reward=reward,
            terminated=terminated,
            truncated=jnp.zeros_like(terminated),
        )


class Acrobot(Env):
    """Acrobot-v1 dynamics (RK4 integration, book-or-nips='book'). Horizon 500."""

    max_episode_steps = 500

    def __init__(self, fixed_horizon: bool = False):
        self.fixed_horizon = fixed_horizon
        self.dt = 0.2
        self.link_length_1 = 1.0
        self.link_length_2 = 1.0
        self.link_mass_1 = 1.0
        self.link_mass_2 = 1.0
        self.link_com_pos_1 = 0.5
        self.link_com_pos_2 = 0.5
        self.link_moi = 1.0
        self.max_vel_1 = 4 * jnp.pi
        self.max_vel_2 = 9 * jnp.pi

    @property
    def observation_space(self) -> Space:
        high = np.array([1.0, 1.0, 1.0, 1.0, 4 * np.pi, 9 * np.pi], dtype=np.float32)
        return Space.box(-high, high, (6,))

    @property
    def action_space(self) -> Space:
        return Space.discrete(3)

    def reset(self, key: jax.Array):
        s = jax.random.uniform(key, (4,), minval=-0.1, maxval=0.1)
        state = ArrayState(x=s)
        return self.obs_of(state), state

    def obs_of(self, state: ArrayState) -> jnp.ndarray:
        th1, th2, dth1, dth2 = state.x
        return jnp.stack(
            [jnp.cos(th1), jnp.sin(th1), jnp.cos(th2), jnp.sin(th2), dth1, dth2]
        )

    def _dsdt(self, s_augmented):
        m1, m2 = self.link_mass_1, self.link_mass_2
        l1 = self.link_length_1
        lc1, lc2 = self.link_com_pos_1, self.link_com_pos_2
        I1 = I2 = self.link_moi
        g = 9.8
        a = s_augmented[-1]
        s = s_augmented[:-1]
        theta1, theta2, dtheta1, dtheta2 = s
        d1 = (
            m1 * lc1**2
            + m2 * (l1**2 + lc2**2 + 2 * l1 * lc2 * jnp.cos(theta2))
            + I1 + I2
        )
        d2 = m2 * (lc2**2 + l1 * lc2 * jnp.cos(theta2)) + I2
        phi2 = m2 * lc2 * g * jnp.cos(theta1 + theta2 - jnp.pi / 2.0)
        phi1 = (
            -m2 * l1 * lc2 * dtheta2**2 * jnp.sin(theta2)
            - 2 * m2 * l1 * lc2 * dtheta2 * dtheta1 * jnp.sin(theta2)
            + (m1 * lc1 + m2 * l1) * g * jnp.cos(theta1 - jnp.pi / 2)
            + phi2
        )
        ddtheta2 = (
            a + d2 / d1 * phi1 - m2 * l1 * lc2 * dtheta1**2 * jnp.sin(theta2) - phi2
        ) / (m2 * lc2**2 + I2 - d2**2 / d1)
        ddtheta1 = -(d2 * ddtheta2 + phi1) / d1
        return jnp.stack([dtheta1, dtheta2, ddtheta1, ddtheta2, jnp.zeros(())])

    def step(self, state: ArrayState, action, key):
        torque = (action - 1).astype(jnp.float32)
        s_aug = jnp.concatenate([state.x, torque[None]])
        # RK4
        dt = self.dt
        k1 = self._dsdt(s_aug)
        k2 = self._dsdt(s_aug + dt / 2 * k1)
        k3 = self._dsdt(s_aug + dt / 2 * k2)
        k4 = self._dsdt(s_aug + dt * k3)
        ns = s_aug + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
        ns = ns[:4]
        wrap = lambda x: ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi
        ns = jnp.stack(
            [
                wrap(ns[0]),
                wrap(ns[1]),
                jnp.clip(ns[2], -self.max_vel_1, self.max_vel_1),
                jnp.clip(ns[3], -self.max_vel_2, self.max_vel_2),
            ]
        )
        new_state = ArrayState(x=ns)
        terminated = (-jnp.cos(ns[0]) - jnp.cos(ns[1] + ns[0])) > 1.0
        if self.fixed_horizon:
            terminated = jnp.zeros_like(terminated)
        reward = jnp.where(terminated, 0.0, -1.0)
        return new_state, TimeStep(
            obs=self.obs_of(new_state),
            reward=reward,
            terminated=terminated,
            truncated=jnp.zeros_like(terminated),
        )

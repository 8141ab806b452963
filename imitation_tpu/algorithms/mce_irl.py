"""Maximum Causal Entropy IRL (tabular, finite horizon).

Counterpart of reference ``algorithms/mce_irl.py`` (560 LoC):

* ``mce_partition_fh`` — soft (MaxCausalEnt) value iteration by backward
  recursion with logsumexp (reference mce_irl.py:38-93);
* ``mce_occupancy_measures`` — forward propagation
  D[t+1] = D[t] @ (pi * T) (reference mce_irl.py:96-144);
* ``TabularPolicy`` — time-dependent pi[t, s, a] (reference :163-258);
* ``MCEIRL`` — gradient ascent on the MCE IRL likelihood: the loss
  ``dot(r_theta, D_pi - D_demo)`` has exactly the MCE IRL gradient
  (reference :467-498); terminates on linf occupancy gap or grad norm
  (reference :543).

Everything is dense matrix algebra under jit; the backward/forward
recursions are ``lax.scan`` over the horizon with [S, A] panels — tiny for
classic gridworlds, MXU-tiled when S is large.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from imitation_tpu.algorithms import base
from imitation_tpu.data import types
from imitation_tpu.envs.tabular import TabularMDP
from imitation_tpu.util.logger import HierarchicalLogger


def mce_partition_fh(
    env: TabularMDP,
    *,
    reward: Optional[jnp.ndarray] = None,
    discount: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Soft value iteration. Returns (V [T,S], Q [T,S,A], pi [T,S,A]).

    Reference: mce_irl.py:38-93 — backward recursion
        V[T-1] = logsumexp_a R ; Q[t] = R + discount * T @ V[t+1] ;
        V[t] = logsumexp_a Q[t] ; pi = exp(Q - V).
    """
    horizon = env.horizon
    T_mat = jnp.asarray(env.transition_matrix)  # [S, A, S]
    if reward is None:
        reward = jnp.asarray(env.reward_matrix)
    R = reward[:, None]  # [S, 1] broadcast over actions

    def backward(V_next, _):
        Q = R + discount * jnp.einsum("sat,t->sa", T_mat, V_next)
        V = jax.scipy.special.logsumexp(Q, axis=1)
        return V, (V, Q)

    V_last = jax.scipy.special.logsumexp(jnp.broadcast_to(R, (env.n_states, env.n_actions)), axis=1)
    Q_last = jnp.broadcast_to(R, (env.n_states, env.n_actions))
    _, (Vs, Qs) = jax.lax.scan(
        backward, V_last, jnp.arange(horizon - 1)
    )
    V = jnp.concatenate([Vs[::-1], V_last[None]], axis=0)  # [T, S]
    Q = jnp.concatenate([Qs[::-1], Q_last[None]], axis=0)  # [T, S, A]
    pi = jnp.exp(Q - V[:, :, None])
    return V, Q, pi


def mce_occupancy_measures(
    env: TabularMDP,
    *,
    pi: Optional[jnp.ndarray] = None,
    reward: Optional[jnp.ndarray] = None,
    discount: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expected state visitations. Returns (Dt [T,S], D [S]).

    Reference: mce_irl.py:96-144 — D[0] = p0; D[t+1][s'] =
    sum_{s,a} D[t][s] pi[t,s,a] T[s,a,s'], with discounting applied in the
    cumulative D.
    """
    if pi is None:
        _, _, pi = mce_partition_fh(env, reward=reward, discount=discount)
    T_mat = jnp.asarray(env.transition_matrix)
    D0 = jnp.asarray(env.initial_state_dist)

    # Dt[0] = p0; Dt[t] = Dt[t-1] @ (pi[t-1] * T).
    def forward(D_prev, pi_t):
        D_next = jnp.einsum("s,sa,sat->t", D_prev, pi_t, T_mat)
        return D_next, D_next

    _, rest = jax.lax.scan(forward, D0, pi[:-1])
    Dt = jnp.concatenate([D0[None], rest], axis=0)  # [T, S]
    discounts = discount ** jnp.arange(env.horizon, dtype=jnp.float32)
    D = jnp.einsum("t,ts->s", discounts, Dt)
    return Dt, D


class TabularPolicy:
    """Time-dependent tabular policy pi[t, s, a] (reference :163-258)."""

    def __init__(self, env: TabularMDP, pi: np.ndarray, rng: int = 0):
        self.env = env
        self.pi = np.asarray(pi)
        assert self.pi.shape == (env.horizon, env.n_states, env.n_actions)
        self.rng = np.random.default_rng(rng)

    def set_pi(self, pi: np.ndarray) -> None:
        assert np.allclose(pi.sum(-1), 1.0, atol=1e-4)
        assert (pi >= 0).all()
        self.pi = np.asarray(pi)

    def predict(self, states: np.ndarray, timesteps: np.ndarray) -> np.ndarray:
        """Sample actions for (state, t) pairs."""
        out = np.empty(len(states), np.int64)
        for i, (s, t) in enumerate(zip(states, timesteps)):
            out[i] = self.rng.choice(self.env.n_actions, p=self.pi[t, s])
        return out


def sample_tabular_trajectories(
    env: TabularMDP,
    pi: jnp.ndarray,  # [T, S, A]
    n_episodes: int,
    key: jax.Array,
) -> List[types.TrajectoryWithRew]:
    """Vectorized episode sampling from a tabular policy — one scan over the
    horizon with n_episodes parallel chains."""
    T_mat = jnp.asarray(env.transition_matrix)
    R = jnp.asarray(env.reward_matrix)
    obs_mat = jnp.asarray(env.observation_matrix)
    k0, key = jax.random.split(key)
    s0 = jax.random.choice(
        k0, env.n_states, (n_episodes,), p=jnp.asarray(env.initial_state_dist)
    )

    def step(carry, inp):
        s, t_idx = carry
        k = inp
        k_a, k_s = jax.random.split(k)
        logits = jnp.log(jnp.clip(pi[t_idx, s], 1e-30))  # [B, A]
        a = jax.random.categorical(k_a, logits, axis=-1)
        probs = T_mat[s, a]  # [B, S]
        s_next = jax.random.categorical(k_s, jnp.log(jnp.clip(probs, 1e-30)), axis=-1)
        r = R[s_next]
        return (s_next, t_idx + 1), (s, a, r, s_next)

    keys = jax.random.split(key, env.horizon)
    _, (ss, aa, rr, sn) = jax.lax.scan(step, (s0, 0), keys)
    ss, aa, rr, sn = map(np.asarray, (ss, aa, rr, sn))  # [T, B]
    obs_mat_np = np.asarray(obs_mat)
    trajs = []
    for b in range(n_episodes):
        state_seq = np.concatenate([ss[:, b], sn[-1:, b]])
        trajs.append(
            types.TrajectoryWithRew(
                obs=obs_mat_np[state_seq],
                acts=aa[:, b],
                rews=rr[:, b].astype(np.float64),
                infos=None,
                terminal=True,
            )
        )
    return trajs


class LinearRewardNet(nn.Module):
    """r(s) = w . phi(s) over observation features — the reference's default
    ``reward_net`` for MCEIRL is an MLP over observations; linear is the
    classic MCE IRL choice. Use MLPRewardNet below for nonlinear."""

    @nn.compact
    def __call__(self, obs_features: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(1, use_bias=False, name="w")(obs_features)[:, 0]


class MLPRewardNet(nn.Module):
    hid_sizes: Tuple[int, ...] = (32, 32)

    @nn.compact
    def __call__(self, obs_features: jnp.ndarray) -> jnp.ndarray:
        x = obs_features
        for i, h in enumerate(self.hid_sizes):
            x = nn.relu(nn.Dense(h, name=f"dense{i}")(x))
        return nn.Dense(1, name="out")(x)[:, 0]


class MCEIRL(base.DemonstrationAlgorithm):
    """Tabular MCE IRL trainer (reference mce_irl.py:264-560)."""

    def __init__(
        self,
        demonstrations: Optional[base.AnyDemonstrations],
        env: TabularMDP,
        reward_net: Optional[nn.Module] = None,
        *,
        optimizer_kwargs: Optional[dict] = None,
        discount: float = 1.0,
        linf_eps: float = 1e-3,
        grad_l2_eps: float = 1e-4,
        log_interval: Optional[int] = 100,
        rng: int = 0,
        custom_logger: Optional[HierarchicalLogger] = None,
    ):
        self.env = env
        self.discount = discount
        self.linf_eps = linf_eps
        self.grad_l2_eps = grad_l2_eps
        self.log_interval = log_interval
        self.demo_state_om: Optional[np.ndarray] = None
        super().__init__(
            demonstrations=demonstrations, custom_logger=custom_logger,
            allow_variable_horizon=False,
        )
        self.reward_net = reward_net or LinearRewardNet()
        opt_kwargs = dict(optimizer_kwargs or {})
        lr = opt_kwargs.pop("lr", opt_kwargs.pop("learning_rate", 1e-2))
        self.optimizer = optax.adam(lr, **opt_kwargs)
        self.variables = self.reward_net.init(
            jax.random.key(rng), jnp.asarray(env.observation_matrix)
        )
        self.opt_state = self.optimizer.init(self.variables["params"])
        self._pi: Optional[np.ndarray] = None
        self._policy = TabularPolicy(
            env, np.full((env.horizon, env.n_states, env.n_actions),
                         1.0 / env.n_actions), rng=rng,
        )

    # -- demonstrations -> state occupancy (reference :402-465) ------------
    def set_demonstrations(self, demonstrations) -> None:
        env = self.env
        if isinstance(demonstrations, jax.Array):
            demonstrations = np.asarray(demonstrations)
        if isinstance(demonstrations, np.ndarray):
            # raw occupancy-measure vector
            if demonstrations.shape != (env.n_states,):
                raise ValueError(
                    f"OM vector shape {demonstrations.shape} != ({env.n_states},)"
                )
            self.demo_state_om = demonstrations.astype(np.float64)
            return
        obs_mat = np.asarray(env.observation_matrix)

        def state_of(obs_row: np.ndarray) -> int:
            # match obs row back to state index
            d = np.abs(obs_mat - obs_row[None]).sum(1)
            return int(d.argmin())

        om = np.zeros(env.n_states, np.float64)
        items = list(demonstrations) if isinstance(demonstrations, Iterable) else demonstrations
        if isinstance(items, list) and items and isinstance(items[0], types.Trajectory):
            self._check_fixed_horizon(len(t) for t in items)
            for traj in items:
                obs = np.asarray(types.maybe_unwrap_dictobs(traj.obs))
                cum_discount = 1.0
                for t in range(len(obs)):
                    om[state_of(obs[t])] += cum_discount
                    if t < len(obs) - 1:
                        cum_discount *= self.discount
            om /= len(items)
        elif isinstance(items, types.TransitionsMinimal) or (
            isinstance(items, list) and items and isinstance(items[0], dict)
        ):
            raise TypeError(
                "MCE IRL requires trajectories or an occupancy-measure vector "
                "(transitions lack episode structure for discounted OM).",
            )
        else:
            raise TypeError(f"unsupported demonstrations type {type(demonstrations)}")
        self.demo_state_om = om

    @property
    def policy(self) -> TabularPolicy:
        return self._policy

    def train(self, max_iter: int = 1000) -> np.ndarray:
        """Gradient loop (reference :500-560). Returns final predicted reward."""
        if self.demo_state_om is None:
            raise ValueError("No demonstrations provided")
        obs_features = jnp.asarray(self.env.observation_matrix)
        demo_om = jnp.asarray(self.demo_state_om, jnp.float32)
        env = self.env
        discount = self.discount

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                r = self.reward_net.apply({"params": p}, obs_features)
                _, D = mce_occupancy_measures(
                    env, reward=jax.lax.stop_gradient(r), discount=discount
                )
                # grad of dot(r, D_pi - D_demo) w.r.t. r is (D_pi - D_demo):
                # exactly the MCE IRL gradient (reference :467-498).
                loss = jnp.dot(r, jax.lax.stop_gradient(D) - demo_om)
                return loss, D

            (loss, D), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt_state = self.optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            grad_norm = optax.global_norm(grads)
            linf = jnp.max(jnp.abs(D - demo_om))
            return new_params, new_opt_state, loss, grad_norm, linf

        params = self.variables["params"]
        opt_state = self.opt_state
        for it in range(max_iter):
            params, opt_state, loss, grad_norm, linf = step(params, opt_state)
            linf_f, grad_f = float(linf), float(grad_norm)
            if self.log_interval is not None and it % self.log_interval == 0:
                self.logger.record("iteration", it)
                self.logger.record("linf_delta", linf_f)
                self.logger.record("grad_norm", grad_f)
                self.logger.dump(it)
            if linf_f <= self.linf_eps or grad_f <= self.grad_l2_eps:
                break
        self.variables = {**self.variables, "params": params}
        self.opt_state = opt_state
        predicted_r = np.asarray(
            self.reward_net.apply(self.variables, obs_features)
        )
        _, _, pi = mce_partition_fh(
            self.env, reward=jnp.asarray(predicted_r), discount=self.discount
        )
        self._policy.set_pi(np.asarray(pi))
        return predicted_r

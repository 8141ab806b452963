"""Train benchmark expert policies with the reference's tuned HPs.

Counterpart of running the reference's ``train_rl`` with its per-env tuned
named configs (reference: src/imitation/scripts/config/train_rl.py —
seals_half_cheetah :109-143, seals_hopper :146-174, seals_ant :215-243,
seals_swimmer :247-275, seals_walker :278-306). HP values below are those
tuned numbers; the training stack is this framework's jitted PPO.

Experts land in ``output/experts/<env_key>/{policy,rollouts}`` plus an
updated ``output/experts/summary.json`` — the layout consumed by the
benchmark runners and the GAIL/AIRL/BC/DAgger parity runs.

Usage: python -m benchmarking.train_experts [env_key ...]
       (default: all five seals envs)
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import flax.linen as nn
import numpy as np

from imitation_tpu.data import rollout as rollout_mod
from imitation_tpu.data import serialize
from imitation_tpu.envs import make_vec_env
from imitation_tpu.models.policies import ActorCriticPolicy
from imitation_tpu.policies import serialize as policy_serialize
from imitation_tpu.rl.ppo import PPO, PPOConfig

OUT_ROOT = os.path.join("output", "experts")


@dataclasses.dataclass
class ExpertSpec:
    env_name: str
    total_timesteps: int
    batch_size: int  # rollout size per iteration (n_steps * num_envs)
    minibatch_size: int
    n_epochs: int
    learning_rate: float
    gamma: float
    gae_lambda: float
    clip_range: float
    ent_coef: float
    vf_coef: float
    max_grad_norm: float
    activation: str  # "tanh" | "relu"
    num_envs: int = 16
    n_eval_episodes: int = 50
    rollout_save_n_episodes: int = 40


# Tuned expert HPs from reference scripts/config/train_rl.py (file:line cites
# in the module docstring). batch_size is the reference's rl.batch_size
# (total rollout per PPO iteration); minibatch_size its rl_kwargs.batch_size.
SPECS = {
    "seals_half_cheetah": ExpertSpec(
        env_name="seals/HalfCheetah-v1", total_timesteps=1_000_000,
        batch_size=512, minibatch_size=64, n_epochs=5,
        learning_rate=3.286871805949382e-4, gamma=0.95, gae_lambda=0.95,
        clip_range=0.1, ent_coef=3.794797423594763e-6,
        vf_coef=0.11483689492120866, max_grad_norm=0.8, activation="tanh",
        num_envs=8,
    ),
    "seals_hopper": ExpertSpec(
        env_name="seals/Hopper-v1", total_timesteps=1_000_000,
        batch_size=2048, minibatch_size=512, n_epochs=20,
        learning_rate=3.904770450788824e-4, gamma=0.995, gae_lambda=0.98,
        clip_range=0.1, ent_coef=1.0159833764878474e-3,
        vf_coef=0.20315938606555833, max_grad_norm=0.9, activation="relu",
    ),
    "seals_swimmer": ExpertSpec(
        env_name="seals/Swimmer-v1", total_timesteps=1_000_000,
        batch_size=2048, minibatch_size=64, n_epochs=5,
        learning_rate=4.14936134792374e-4, gamma=0.999, gae_lambda=0.95,
        clip_range=0.1, ent_coef=5.167107294612664e-8,
        vf_coef=0.6162112311062333, max_grad_norm=2.0, activation="relu",
    ),
    "seals_walker2d": ExpertSpec(
        env_name="seals/Walker2d-v1", total_timesteps=1_000_000,
        batch_size=8192, minibatch_size=128, n_epochs=20,
        learning_rate=1.38575372312869e-4, gamma=0.98, gae_lambda=0.92,
        clip_range=0.4, ent_coef=1.3057334805552262e-4,
        vf_coef=0.6167177795726859, max_grad_norm=0.6, activation="relu",
    ),
    "seals_ant": ExpertSpec(
        env_name="seals/Ant-v1", total_timesteps=1_000_000,
        batch_size=2048, minibatch_size=16, n_epochs=10,
        learning_rate=1.7959211641976886e-4, gamma=0.995, gae_lambda=0.8,
        clip_range=0.3, ent_coef=3.1441389214159857e-6,
        vf_coef=0.4351450387648799, max_grad_norm=0.9, activation="tanh",
    ),
}

_ACTIVATIONS = {"tanh": nn.tanh, "relu": nn.relu}


def train_expert(
    key: str, seed: int = 0, resume: bool = False,
    extra_timesteps: int = 0, out_root: str = OUT_ROOT,
) -> float:
    spec = SPECS[key]
    if extra_timesteps:
        spec = dataclasses.replace(spec, total_timesteps=extra_timesteps)
    venv = make_vec_env(spec.env_name, num_envs=spec.num_envs)
    if spec.batch_size % spec.num_envs:
        raise ValueError(f"batch_size {spec.batch_size} % num_envs {spec.num_envs}")
    n_steps = spec.batch_size // spec.num_envs
    policy = ActorCriticPolicy(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
        hid_sizes=(64, 64),
        activation=_ACTIVATIONS[spec.activation],
        normalize_features=True,
        log_std_init=-0.5,
    )
    resume_variables = None
    if resume:
        _, resume_variables = policy_serialize.load_policy_from_path(
            os.path.join(OUT_ROOT, key, "policy")
        )
    ppo = PPO(
        venv,
        policy,
        PPOConfig(
            n_steps=n_steps,
            n_minibatches=spec.batch_size // spec.minibatch_size,
            n_epochs=spec.n_epochs,
            learning_rate=spec.learning_rate,
            gamma=spec.gamma,
            gae_lambda=spec.gae_lambda,
            clip_range=spec.clip_range,
            ent_coef=spec.ent_coef,
            vf_coef=spec.vf_coef,
            max_grad_norm=spec.max_grad_norm,
        ),
        seed=seed,
    )
    state = ppo.init_state()
    if resume_variables is not None:
        state = state.replace(variables=resume_variables)
        print(f"[{key}] resumed from saved policy")
    t0 = time.time()
    steps_per_iter = n_steps * spec.num_envs
    total = 0
    best = -np.inf
    # Track a running mean of finished-episode returns for progress prints.
    while total < spec.total_timesteps:
        chunk_steps = min(spec.total_timesteps - total, 50 * steps_per_iter)
        state = ppo.learn(state, chunk_steps)
        total += chunk_steps
        ret = _quick_eval(ppo, state, venv, n_episodes=5, seed=seed + 7)
        best = max(best, ret)
        print(
            f"[{key}] {total}/{spec.total_timesteps} steps "
            f"eval5={ret:.1f} best={best:.1f} ({time.time()-t0:.0f}s)",
            flush=True,
        )

    final = _quick_eval(ppo, state, venv, n_episodes=spec.n_eval_episodes,
                        seed=seed + 1)
    print(f"[{key}] final eval{spec.n_eval_episodes}={final:.1f}")

    out_dir = os.path.join(out_root, key)
    policy_serialize.save_policy(
        os.path.join(out_dir, "policy"), policy, state.variables
    )
    trajs = rollout_mod.generate_trajectories(
        policy.sample_fn(), state.variables, venv,
        rollout_mod.make_min_episodes(spec.rollout_save_n_episodes),
        rng=seed + 2,
    )
    serialize.save(os.path.join(out_dir, "rollouts"), trajs)

    summary_path = os.path.join(out_root, "summary.json")
    summary = {}
    if os.path.exists(summary_path):
        with open(summary_path) as f:
            summary = json.load(f)
    summary[key] = final
    with open(summary_path, "w") as f:
        json.dump(summary, f, indent=1)
    return final


def train_expert_sac(
    key: str, seed: int = 0, total_timesteps: int = 1_000_000,
    out_root: str = OUT_ROOT, num_envs: int = 16,
) -> float:
    """SAC expert (continuous-control envs where PPO's tuned ceiling is
    low — e.g. HalfCheetah, where SAC reliably clears 2500+). Mirrors the
    reference's SAC expert option (scripts/ingredients/rl.py:104-120 `sac`
    named config); saved in the same expert layout."""
    from imitation_tpu.rl.sac import SAC, SACConfig

    spec = SPECS[key]
    venv = make_vec_env(spec.env_name, num_envs=num_envs)
    train_freq = 16  # 256 transitions per round at 16 envs
    sac = SAC(
        venv,
        SACConfig(
            train_freq=train_freq,
            gradient_steps=train_freq * num_envs,  # update-to-data ratio 1
            learning_starts=10_000,
            batch_size=256,
        ),
        seed=seed,
    )
    state = sac.init_state()
    t0 = time.time()
    steps_per_chunk = 50 * train_freq * num_envs
    total = 0
    best = -np.inf
    while total < total_timesteps:
        chunk = min(total_timesteps - total, steps_per_chunk)
        state = sac.learn(state, chunk)
        total += chunk
        trajs = rollout_mod.generate_trajectories(
            sac.policy.sample_fn(), {"params": state.actor_params}, venv,
            rollout_mod.make_min_episodes(3), rng=seed + 7,
        )
        ret = float(np.mean([t.rews.sum() for t in trajs]))
        best = max(best, ret)
        print(f"[{key}/sac] {total}/{total_timesteps} steps eval3={ret:.1f} "
              f"best={best:.1f} ({time.time()-t0:.0f}s)", flush=True)

    policy = sac.policy
    variables = {"params": state.actor_params}
    final = float(np.mean([
        t.rews.sum() for t in rollout_mod.generate_trajectories(
            policy.sample_fn(), variables, venv,
            rollout_mod.make_min_episodes(spec.n_eval_episodes), rng=seed + 1,
        )
    ]))
    print(f"[{key}/sac] final eval{spec.n_eval_episodes}={final:.1f}")
    out_dir = os.path.join(out_root, key)
    policy_serialize.save_policy(
        os.path.join(out_dir, "policy"), policy, variables
    )
    trajs = rollout_mod.generate_trajectories(
        policy.sample_fn(), variables, venv,
        rollout_mod.make_min_episodes(spec.rollout_save_n_episodes),
        rng=seed + 2,
    )
    serialize.save(os.path.join(out_dir, "rollouts"), trajs)
    summary_path = os.path.join(out_root, "summary.json")
    summary = {}
    if os.path.exists(summary_path):
        with open(summary_path) as f:
            summary = json.load(f)
    summary[key] = final
    with open(summary_path, "w") as f:
        json.dump(summary, f, indent=1)
    return final


def _quick_eval(ppo, state, venv, n_episodes: int, seed: int) -> float:
    trajs = rollout_mod.generate_trajectories(
        ppo.policy.sample_fn(), state.variables, venv,
        rollout_mod.make_min_episodes(n_episodes), rng=seed,
    )
    return float(np.mean([t.rews.sum() for t in trajs]))


if __name__ == "__main__":
    argv = sys.argv[1:]
    if "--backend" in argv:
        i = argv.index("--backend")
        if argv[i + 1] == "cpu":
            # Before backend init; some TPU plugins ignore JAX_PLATFORMS.
            import jax

            jax.config.update("jax_platforms", "cpu")
        del argv[i : i + 2]
    resume = "--resume" in argv
    argv = [a for a in argv if a != "--resume"]
    extra = 0
    if "--extra-timesteps" in argv:
        i = argv.index("--extra-timesteps")
        extra = int(argv[i + 1])
        del argv[i : i + 2]
    out_root = OUT_ROOT
    if "--out-root" in argv:
        i = argv.index("--out-root")
        out_root = argv[i + 1]
        del argv[i : i + 2]
    use_sac = "--sac" in argv
    argv = [a for a in argv if a != "--sac"]
    keys = argv or list(SPECS)
    for k in keys:
        if use_sac:
            train_expert_sac(
                k, total_timesteps=extra or 1_000_000, out_root=out_root
            )
        else:
            train_expert(k, resume=resume, extra_timesteps=extra, out_root=out_root)

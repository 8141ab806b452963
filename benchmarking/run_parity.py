"""Benchmark parity runs: {bc, dagger, gail, airl} x 5 seals MuJoCo envs.

The reference's benchmark matrix (reference benchmarking/README.md:3-6) at
its tuned hyperparameters (reference scripts/config/tuned_hps/
{algo}_seals_{env}_best_hp_eval.json — values inlined below). Experts and
demonstrations come from ``output/experts`` (train with
``python -m benchmarking.train_experts``); results append to
``output/parity/results.json``.

Usage: python -m benchmarking.run_parity <algo> <env_key> [--seed N]
       [--total-timesteps N]   (to shorten from the reference budget)
e.g.:  python -m benchmarking.run_parity gail seals_swimmer
"""

from __future__ import annotations

import argparse
import json
import os
import time

import flax.linen as nn
import numpy as np

from imitation_tpu.data import rollout as rollout_mod
from imitation_tpu.data import serialize
from imitation_tpu.envs import make_vec_env
from imitation_tpu.models.policies import ActorCriticPolicy
from imitation_tpu.policies import serialize as policy_serialize
from imitation_tpu.rewards.reward_nets import BasicRewardNet, BasicShapedRewardNet
from imitation_tpu.rl.ppo import PPOConfig

EXPERTS_DIR = os.path.join("output", "experts")
# PARITY_RESULTS_PATH lets drivers/tests isolate the results file
# (benchmarking.run_matrix --fast smoke writes to a scratch path).
OUT_PATH = os.environ.get(
    "PARITY_RESULTS_PATH", os.path.join("output", "parity", "results.json")
)
# Evaluation episodes for the final return (reference protocol: 50,
# scripts/ingredients/policy_evaluation.py:20); overridable for fast smokes.
EVAL_EPISODES = 50

ENV_IDS = {
    "seals_ant": "seals/Ant-v1",
    "seals_half_cheetah": "seals/HalfCheetah-v1",
    "seals_hopper": "seals/Hopper-v1",
    "seals_swimmer": "seals/Swimmer-v1",
    "seals_walker2d": "seals/Walker2d-v1",
}

# --- tuned HPs (reference scripts/config/tuned_hps/*.json) -----------------

# gail/airl: (total, demo_batch, replay_cap, n_disc, rl_batch, minibatch,
#             clip, ent, lam, gamma, lr, max_grad_norm, epochs, vf)
ADVERSARIAL_HPS = {
    ("gail", "seals_ant"): (1e7, 32, 16384, 8, 16384, 16, 0.3, 8.87e-3, 0.8, 0.995, 2.43e-5, 0.9, 10, 0.435),
    ("gail", "seals_half_cheetah"): (1e7, 8192, 512, 8, 4096, 64, 0.1, 3.99e-6, 0.95, 0.95, 2.63e-4, 0.8, 5, 0.115),
    ("gail", "seals_hopper"): (1e7, 128, 4096, 8, 4096, 512, 0.1, 1.26e-3, 0.98, 0.995, 4.4e-5, 0.9, 20, 0.203),
    ("gail", "seals_swimmer"): (1e7, 32, 4096, 16, 4096, 64, 0.1, 2.26e-6, 0.95, 0.999, 2.02e-5, 2.0, 5, 0.616),
    ("gail", "seals_walker2d"): (1e7, 512, 16384, 16, 16384, 128, 0.4, 7.57e-4, 0.92, 0.98, 1.94e-5, 0.6, 20, 0.617),
    ("airl", "seals_ant"): (1e7, 8192, 8192, 16, 8192, 16, 0.3, 3.28e-6, 0.8, 0.995, 3.25e-5, 0.9, 10, 0.435),
    ("airl", "seals_half_cheetah"): (1e7, 2048, 512, 16, 8192, 64, 0.1, 5.54e-4, 0.95, 0.95, 4.72e-4, 0.8, 5, 0.115),
    ("airl", "seals_hopper"): (1e7, 2048, 8192, 16, 8192, 512, 0.1, 9.71e-3, 0.98, 0.995, 5.81e-4, 0.9, 20, 0.203),
    ("airl", "seals_swimmer"): (1e7, 128, 16384, 16, 16384, 64, 0.1, 6.14e-3, 0.95, 0.999, 1.34e-3, 2.0, 5, 0.616),
    ("airl", "seals_walker2d"): (1e7, 512, 16384, 16, 16384, 128, 0.4, 2.0e-3, 0.92, 0.98, 3.05e-5, 0.6, 20, 0.617),
}

# bc: (batch_size, l2_weight, lr, n_epochs)
BC_HPS = {
    "seals_ant": (16, 2.35e-5, 1.76e-3, 5),
    "seals_half_cheetah": (64, 5.73e-3, 8.06e-3, 20),
    "seals_hopper": (64, 1.36e-6, 7.17e-4, 20),
    "seals_swimmer": (16, 4.38e-5, 1.64e-3, 10),
    "seals_walker2d": (32, 1.47e-3, 3.03e-4, 20),
}

# dagger: (total_timesteps, beta_schedule, rollout_round_min_episodes,
#          bc_n_epochs)  — bc lr=1e-3, l2=1e-4, batch 16 across envs
DAGGER_HPS = {
    "seals_ant": (100_000, ("linear", 15), 5, 10),
    "seals_half_cheetah": (60_000, ("exp", 0.7), 5, 5),
    "seals_hopper": (100_000, ("exp", 0.7), 10, 1),
    "seals_swimmer": (100_000, ("linear", 15), 3, 1),
    "seals_walker2d": (100_000, ("exp", 0.7), 5, 5),
}


def _set_provenance(budget=None):
    """Record run provenance (demo source, backend, budget) once per run;
    ``record`` folds it into every row, so summarize can emit mechanical
    budget/expert columns instead of editorial footnotes."""
    import jax

    prov = {
        "experts_dir": os.environ.get("PARITY_EXPERTS_DIR", EXPERTS_DIR),
        "backend": jax.default_backend(),
    }
    if budget is not None:
        prov["total_timesteps"] = int(budget) if not isinstance(budget, str) else budget
    globals()["_PROVENANCE"] = prov


def load_expert(env_key: str, venv):
    experts_dir = os.environ.get("PARITY_EXPERTS_DIR", EXPERTS_DIR)
    policy, variables = policy_serialize.load_policy_from_path(
        os.path.join(experts_dir, env_key, "policy")
    )
    demos = serialize.load(os.path.join(experts_dir, env_key, "rollouts"))
    return policy, variables, list(demos)


def eval50(policy_apply, variables, venv, n=None, seed=12345):
    if n is None:
        n = EVAL_EPISODES
    trajs = rollout_mod.generate_trajectories(
        policy_apply, variables, venv, rollout_mod.make_min_episodes(n), rng=seed
    )
    return float(np.mean([t.rews.sum() for t in trajs]))


def run_bc(env_key: str, seed: int, total_override=None):
    from imitation_tpu.algorithms.bc import BC

    batch_size, l2, lr, n_epochs = BC_HPS[env_key]
    _set_provenance(f"{n_epochs} epochs")
    venv = make_vec_env(ENV_IDS[env_key], num_envs=16)
    _, _, demos = load_expert(env_key, venv)
    # FeedForward32 + NormalizeFeaturesExtractor: every reference tuned
    # bc config pins this (config/tuned_hps/bc_*_best_hp_eval.json).
    policy = ActorCriticPolicy(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
        hid_sizes=(32, 32),
        normalize_features=True,
    )
    bc = BC(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
        demonstrations=demos,
        policy=policy,
        rng=seed,
        batch_size=batch_size,
        l2_weight=l2,
        optimizer_kwargs=dict(learning_rate=lr),
    )
    if total_override:
        # Budget override for fast smokes: interpreted as n_batches
        # (BC's other budget unit, reference bc.py BCTrainingMetrics).
        bc.train(n_batches=int(total_override))
    else:
        bc.train(n_epochs=n_epochs)
    return eval50(bc.policy.sample_fn(), bc.state.variables, venv, seed=seed + 1)


def run_dagger(env_key: str, seed: int, total_override=None):
    import tempfile

    from imitation_tpu.algorithms.bc import BC
    from imitation_tpu.algorithms.dagger import (
        ExponentialBetaSchedule,
        LinearBetaSchedule,
        SimpleDAggerTrainer,
    )

    total, (sched_kind, sched_arg), min_eps, bc_epochs = DAGGER_HPS[env_key]
    if total_override:
        total = total_override
    _set_provenance(total)
    venv = make_vec_env(ENV_IDS[env_key], num_envs=16)
    expert_policy, expert_vars, _ = load_expert(env_key, venv)
    schedule = (
        LinearBetaSchedule(sched_arg) if sched_kind == "linear"
        else ExponentialBetaSchedule(sched_arg)
    )
    bc = BC(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
        policy=ActorCriticPolicy(
            observation_space=venv.observation_space,
            action_space=venv.action_space,
            hid_sizes=(32, 32),
            normalize_features=True,
        ),
        rng=seed,
        batch_size=16,
        l2_weight=1e-4,
        optimizer_kwargs=dict(learning_rate=1e-3),
    )
    with tempfile.TemporaryDirectory(prefix="dagger_parity_") as scratch:
        trainer = SimpleDAggerTrainer(
            venv=venv,
            scratch_dir=scratch,
            expert_policy_apply=expert_policy.sample_fn(),
            expert_params=expert_vars,
            rng=seed,
            beta_schedule=schedule,
            bc_trainer=bc,
        )
        # Live history so a SIGTERM'd long run (Ant takes ~5h on the CPU
        # backend) records a partial result instead of losing everything.
        # Throttled to one 5-episode eval per minute so cheap envs with
        # many short rounds don't double their wall time.
        history = []
        globals()["_LIVE_HISTORY"] = history
        t0 = time.time()
        last_eval = [0.0]

        def _on_round_end(round_num, steps_so_far):
            now = time.time()
            if now - last_eval[0] < 60.0:
                return
            last_eval[0] = now
            ret = eval50(
                trainer.policy.sample_fn(), trainer.policy_variables, venv,
                n=5, seed=seed + 7,
            )
            history.append({
                "round": round_num,
                "timesteps": steps_so_far,
                "return5": ret,
                "wall_s": now - t0,
            })
            print(f"[dagger/{env_key}] round {round_num} "
                  f"({steps_so_far} steps) return5={ret:.1f}", flush=True)
            # Kill-proof partial row: a SIGKILL (or a SIGTERM deferred
            # inside a native XLA call, which lost rlhf hc s2 in round 4)
            # can land any time; upsert the latest eval so the run never
            # records nothing. The final record replaces this row.
            record("dagger", env_key, seed, ret,
                   {"history": list(history), "partial": True,
                    "wall_s": now - t0},
                   replace_partial=True)

        trainer.train(
            total,
            rollout_round_min_episodes=min_eps,
            bc_train_kwargs=dict(n_epochs=bc_epochs),
            on_round_end=_on_round_end,
        )
        return eval50(
            trainer.policy.sample_fn(), trainer.policy_variables, venv,
            seed=seed + 1,
        )


def run_adversarial(algo: str, env_key: str, seed: int, total_override=None):
    from imitation_tpu.algorithms.adversarial.airl import AIRL
    from imitation_tpu.algorithms.adversarial.gail import GAIL

    (total, demo_bs, replay, n_disc, rl_batch, mb, clip, ent, lam, gamma, lr,
     mgn, epochs, vf) = ADVERSARIAL_HPS[(algo, env_key)]
    if total_override:
        total = total_override
    _set_provenance(total)
    # More envs amortizes per-step host/dispatch overhead (lockstep MuJoCo
    # engine keeps scaling); n_steps = rl_batch // num_envs stays integral
    # for all tuned rl_batch values (>= 4096).
    num_envs = 64
    venv = make_vec_env(ENV_IDS[env_key], num_envs=num_envs)
    # Separate eval venv: (a) evals never clobber the training collector's
    # env state, (b) fixed-horizon envs pay num_envs * horizon steps per
    # eval pass regardless of episodes wanted, so 16 envs makes the
    # periodic 5-episode evals 4x cheaper than reusing the 64-env train venv.
    eval_venv = make_vec_env(ENV_IDS[env_key], num_envs=16)
    _, _, demos = load_expert(env_key, venv)

    policy = ActorCriticPolicy(  # FeedForward32Policy + NormalizeFeaturesExtractor
        observation_space=venv.observation_space,
        action_space=venv.action_space,
        hid_sizes=(32, 32),
        normalize_features=True,
    )
    gen_config = PPOConfig(
        n_steps=rl_batch // num_envs,
        n_minibatches=max(1, rl_batch // mb),
        n_epochs=epochs,
        learning_rate=lr,
        gamma=gamma,
        gae_lambda=lam,
        clip_range=clip,
        ent_coef=ent,
        vf_coef=vf,
        max_grad_norm=mgn,
    )
    if algo == "gail":
        reward_net = BasicRewardNet(
            observation_space=venv.observation_space,
            action_space=venv.action_space,
            normalize_input=True,
        )
        trainer = GAIL(
            demonstrations=demos,
            demo_batch_size=demo_bs,
            venv=venv,
            policy=policy,
            reward_net=reward_net,
            gen_config=gen_config,
            n_disc_updates_per_round=n_disc,
            gen_replay_buffer_capacity=replay,
            seed=seed,
        )
    else:
        reward_net = BasicShapedRewardNet(
            observation_space=venv.observation_space,
            action_space=venv.action_space,
            normalize_input=True,
        )
        trainer = AIRL(
            demonstrations=demos,
            demo_batch_size=demo_bs,
            venv=venv,
            policy=policy,
            reward_net=reward_net,
            gen_config=gen_config,
            n_disc_updates_per_round=n_disc,
            gen_replay_buffer_capacity=replay,
            seed=seed,
        )
    t0 = time.time()
    n_rounds = max(1, int(total) // trainer.gen_train_timesteps)
    log_every = max(1, n_rounds // 40)
    history = []
    globals()["_LIVE_HISTORY"] = history  # read by the SIGTERM handler
    hist_path = os.path.join(
        os.path.dirname(OUT_PATH), f"{algo}_{env_key}_s{seed}_history.json"
    )
    os.makedirs(os.path.dirname(hist_path), exist_ok=True)
    for r in range(n_rounds):
        trainer.train(trainer.gen_train_timesteps)
        if (r + 1) % log_every == 0:
            ret = eval50(
                trainer.policy.sample_fn(), trainer.policy_variables,
                eval_venv, n=5, seed=seed + 7,
            )
            history.append({
                "round": r + 1,
                "timesteps": (r + 1) * trainer.gen_train_timesteps,
                "return5": ret,
                "wall_s": time.time() - t0,
            })
            # Incremental dump so an interrupted long run still leaves a
            # usable learning curve.
            with open(hist_path, "w") as f:
                json.dump(history, f, indent=1)
            print(f"[{algo}/{env_key}] round {r+1}/{n_rounds} "
                  f"({history[-1]['timesteps']} steps) return5={ret:.1f} "
                  f"({history[-1]['wall_s']:.0f}s)", flush=True)
            # Kill-proof partial row (see run_dagger): upsert the latest
            # eval so SIGKILL / deferred-SIGTERM never loses the run.
            record(algo, env_key, seed, ret,
                   {"history": list(history), "partial": True,
                    "wall_s": history[-1]["wall_s"]},
                   replace_partial=True)
    final = eval50(
        trainer.policy.sample_fn(), trainer.policy_variables, eval_venv,
        seed=seed + 1,
    )
    return final, history


RUNNERS = {"bc": run_bc, "dagger": run_dagger}


def record(algo, env_key, seed, final, extra=None, replace_partial=False):
    """Append a result row; with ``replace_partial``, first drop any
    existing partial row for the same (cell, seed) so in-progress upserts
    (written every eval from the runners' history callbacks) never stack
    up and the final complete row supersedes its own partials."""
    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    entry = {"return": final, "seed": seed, "ts": time.time()}
    if extra:
        entry.update(extra)
    entry.update(globals().get("_PROVENANCE") or {})
    # Concurrent runners (chip queue + CPU-backend seed runs) append here;
    # serialize the read-modify-write under an flock.
    import fcntl

    lock_path = OUT_PATH + ".lock"
    with open(lock_path, "w") as lock_f:
        fcntl.flock(lock_f, fcntl.LOCK_EX)
        try:
            results = {}
            if os.path.exists(OUT_PATH):
                try:
                    with open(OUT_PATH) as f:
                        results = json.load(f)
                except (json.JSONDecodeError, UnicodeDecodeError):
                    # A writer killed mid-write (pre-atomic-rename layouts)
                    # left truncated JSON: quarantine it instead of losing
                    # THIS run's result too.
                    quarantine = OUT_PATH + f".corrupt.{int(time.time())}"
                    os.replace(OUT_PATH, quarantine)
                    print(f"corrupt results file quarantined to {quarantine}")
            rows = results.setdefault(f"{algo}/{env_key}", [])
            if replace_partial:
                rows[:] = [
                    r for r in rows
                    if not (r.get("seed") == seed and r.get("partial"))
                ]
            rows.append(entry)
            # Atomic write-then-rename: a SIGTERM/SIGKILL between open and
            # flush can never leave a half-written results.json behind.
            tmp = OUT_PATH + ".tmp"
            with open(tmp, "w") as f:
                json.dump(results, f, indent=1)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, OUT_PATH)
        finally:
            fcntl.flock(lock_f, fcntl.LOCK_UN)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("algo", choices=["bc", "dagger", "gail", "airl"])
    ap.add_argument("env_key", choices=sorted(ENV_IDS))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--total-timesteps", type=int, default=None)
    ap.add_argument("--eval-episodes", type=int, default=50)
    ap.add_argument("--backend", choices=["device", "cpu"], default="device")
    args = ap.parse_args()
    globals()["EVAL_EPISODES"] = args.eval_episodes
    if args.backend == "cpu":
        # Must happen before the backend initializes; some TPU plugins
        # ignore the JAX_PLATFORMS env var, so set it via jax.config.
        import jax

        jax.config.update("jax_platforms", "cpu")
    import imitation_tpu

    imitation_tpu.enable_compile_cache()

    t0 = time.time()

    # timeout(1) kills with SIGTERM; record the partial result (latest eval
    # from the history callback) instead of losing the whole run.
    import signal

    class _Term(Exception):
        pass

    signal.signal(signal.SIGTERM, lambda *a: (_ for _ in ()).throw(_Term()))

    if args.algo in RUNNERS:
        try:
            final = RUNNERS[args.algo](args.env_key, args.seed, args.total_timesteps)
        except _Term:
            # Same partial-record path as the adversarial runners: the
            # dagger runner maintains _LIVE_HISTORY; bc has none (it is
            # fast enough that losing a run is fine).
            hist = globals().get("_LIVE_HISTORY") or []
            if not hist:
                print("SIGTERM before completion; nothing recorded")
                raise SystemExit(143)
            final = hist[-1].get("return5", float("nan"))
            extra = {"history": hist, "partial": True,
                     "wall_s": time.time() - t0}
            record(args.algo, args.env_key, args.seed, final, extra,
                   replace_partial=True)
            print(f"partial result recorded after SIGTERM: {final:.1f}")
            raise SystemExit(143)
        extra = {}
    else:
        try:
            final, history = run_adversarial(
                args.algo, args.env_key, args.seed, args.total_timesteps
            )
            extra = {"history": history}
        except _Term:
            hist = globals().get("_LIVE_HISTORY") or []
            if not hist:
                raise
            final = hist[-1].get("return5", float("nan"))
            extra = {"history": hist, "partial": True,
                     "wall_s": time.time() - t0}
            record(args.algo, args.env_key, args.seed, final, extra,
                   replace_partial=True)
            print(f"partial result recorded after SIGTERM: {final:.1f}")
            raise SystemExit(143)
    extra["wall_s"] = time.time() - t0
    if args.total_timesteps:
        extra["total_timesteps_override"] = args.total_timesteps
    record(args.algo, args.env_key, args.seed, final, extra,
           replace_partial=True)
    print(f"{args.algo}/{args.env_key} seed={args.seed}: return={final:.1f} "
          f"({extra['wall_s']:.0f}s)")


if __name__ == "__main__":
    main()

"""Host/device phase split of the GAIL seals/HalfCheetah round.

Measures, with ``util.profiling.PhaseTimer`` wired into the PPO host path
and the discriminator update, where the wall time of one adversarial round
goes at the benchmark configuration (tuned HPs, 64 lockstep MuJoCo envs):

* serialized collection — host_collect / device_update / disc_update
  fractions with per-phase fetch barriers;
* overlapped collection — total round time plus the host-blocked
  ``collect_join`` wait, quantifying how much of the collect the device
  update actually hides.

Writes JSON to ``output/r8/phase_split.json`` and prints it; the numbers
feed docs/performance.md. Run on a quiet host (the point is attribution,
not peak throughput).

Usage: python -m benchmarking.profile_gail_hc [--rounds N] [--backend cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def build_trainer(overlap: bool):
    from benchmarking.run_parity import ADVERSARIAL_HPS, load_expert
    from imitation_tpu.algorithms.adversarial.gail import GAIL
    from imitation_tpu.envs import make_vec_env
    from imitation_tpu.models.policies import ActorCriticPolicy
    from imitation_tpu.rewards.reward_nets import BasicRewardNet
    from imitation_tpu.rl.ppo import PPOConfig

    (_, demo_bs, replay, n_disc, rl_batch, mb, clip, ent, lam, gamma, lr,
     mgn, epochs, vf) = ADVERSARIAL_HPS[("gail", "seals_half_cheetah")]
    num_envs = 64
    venv = make_vec_env("seals/HalfCheetah-v1", num_envs=num_envs)
    _, _, demos = load_expert("seals_half_cheetah", venv)
    trainer = GAIL(
        demonstrations=demos,
        demo_batch_size=demo_bs,
        venv=venv,
        policy=ActorCriticPolicy(
            observation_space=venv.observation_space,
            action_space=venv.action_space,
            hid_sizes=(32, 32),
            normalize_features=True,
        ),
        reward_net=BasicRewardNet(
            observation_space=venv.observation_space,
            action_space=venv.action_space,
            normalize_input=True,
        ),
        gen_config=PPOConfig(
            n_steps=rl_batch // num_envs,
            n_minibatches=max(1, rl_batch // mb),
            n_epochs=epochs, learning_rate=lr, gamma=gamma, gae_lambda=lam,
            clip_range=clip, ent_coef=ent, vf_coef=vf, max_grad_norm=mgn,
            overlap_collection=overlap,
        ),
        n_disc_updates_per_round=n_disc,
        gen_replay_buffer_capacity=replay,
        seed=0,
    )
    return trainer, venv


def measure(overlap: bool, n_rounds: int):
    from imitation_tpu.util.profiling import PhaseTimer

    trainer, venv = build_trainer(overlap)
    trainer.train(trainer.gen_train_timesteps)  # warmup: compiles
    timer = PhaseTimer()
    trainer.gen_algo.phase_timer = timer
    t0 = time.perf_counter()
    trainer.train(n_rounds * trainer.gen_train_timesteps)
    import jax

    jax.device_get(trainer.gen_state.variables["params"])  # fetch barrier
    total = time.perf_counter() - t0
    report = timer.report()
    gen = trainer.gen_algo
    if hasattr(gen, "discard_pending_collection"):
        gen.discard_pending_collection()
    if getattr(gen, "_collect_pool", None) is not None:
        gen._collect_pool.shutdown(wait=True)
        gen._collect_pool = None
    venv.close()
    out = {
        "mode": "overlapped" if overlap else "serialized",
        "n_rounds": n_rounds,
        "round_s": total / n_rounds,
        "steps_per_s": n_rounds * trainer.gen_train_timesteps / total,
    }
    for k, v in report.items():
        out[k] = round(v, 4)
    # Fractions of total wall time for the attribution phases.
    for phase in ("host_collect", "device_update", "disc_update",
                  "collect_join"):
        key = f"time/{phase}_s"
        if key in report:
            out[f"{phase}_frac"] = round(report[key] / total, 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=12)
    ap.add_argument("--backend", choices=["device", "cpu"], default="device")
    args = ap.parse_args()
    if args.backend == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import imitation_tpu

    imitation_tpu.enable_compile_cache()
    result = {
        "config": "gail seals/HalfCheetah tuned HPs, 64 envs",
        "load_avg_1m": round(os.getloadavg()[0], 2),
        "serialized": measure(False, args.rounds),
        "overlapped": measure(True, args.rounds),
    }
    result["overlap_speedup"] = round(
        result["serialized"]["round_s"] / result["overlapped"]["round_s"], 3
    )
    os.makedirs(os.path.join("output", "r8"), exist_ok=True)
    with open(os.path.join("output", "r8", "phase_split.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()

"""Env-count sweep of the headline GAIL bench (post-queue chip window).

Measures the same fused adversarial round as bench.py at several env batch
sizes to find the chip's throughput ceiling; the headline bench.py metric
stays at 1024 envs for cross-round comparability, and the sweep results are
reported alongside in RESULTS.md.
"""

import json
import time


def measure(num_envs: int, n_steps: int = 128, n_rounds: int = 10) -> float:
    import jax

    from imitation_tpu.algorithms.adversarial.gail import GAIL
    from imitation_tpu.envs import make_vec_env
    from imitation_tpu.rl.ppo import PPOConfig
    from imitation_tpu.testing import experts

    venv = make_vec_env("CartPole-v1", num_envs=num_envs, max_episode_steps=500)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        demo_venv = make_vec_env("CartPole-v1", num_envs=64, max_episode_steps=100)
        demos = experts.generate_expert_trajectories(
            "CartPole-v1", demo_venv, min_episodes=64, seed=0
        )
    trainer = GAIL(
        demonstrations=demos,
        demo_batch_size=2048,
        venv=venv,
        gen_config=PPOConfig(n_steps=n_steps, n_minibatches=32, n_epochs=5),
        n_disc_updates_per_round=2,
        allow_variable_horizon=True,
        seed=0,
    )

    def force():
        g = sum(x.sum() for x in jax.tree.leaves(trainer.gen_state.variables))
        d = sum(x.sum() for x in jax.tree.leaves(trainer.disc_state.variables))
        return float(g) + float(d)

    def one_round():
        trainer.train_gen(sync=False)
        for _ in range(trainer.n_disc_updates_per_round):
            trainer.train_disc(sync=False)

    one_round()
    force()
    t0 = time.perf_counter()
    for _ in range(n_rounds):
        one_round()
    force()
    elapsed = time.perf_counter() - t0
    return n_rounds * n_steps * num_envs / elapsed


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/imitation_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    results = {}
    for num_envs in (1024, 2048, 4096, 8192):
        sps = measure(num_envs)
        results[num_envs] = round(sps, 1)
        print(json.dumps({"num_envs": num_envs, "steps_per_s": results[num_envs]}),
              flush=True)
    print(json.dumps({"sweep": results}))


if __name__ == "__main__":
    main()

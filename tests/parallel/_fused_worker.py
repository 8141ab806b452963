"""Worker for the multi-process FUSED adversarial test (test_distributed.py).

Two processes x 4 virtual CPU devices run GAIL's ``train_fused`` — the
scanned multi-round program — SPMD over the global hybrid mesh. Both
processes must end with bit-identical replicated generator and
discriminator parameters.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count="
    + os.environ.get("WORKER_LOCAL_DEVICES", "4")
)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from imitation_tpu.algorithms.adversarial.gail import GAIL  # noqa: E402
from imitation_tpu.envs import make_vec_env  # noqa: E402
from imitation_tpu.parallel import distributed  # noqa: E402
from imitation_tpu.rl.ppo import PPOConfig  # noqa: E402
from imitation_tpu.testing import experts  # noqa: E402


def main(out_dir: str) -> None:
    distributed.initialize()
    pid = jax.process_index()
    assert jax.process_count() == int(os.environ.get("JAX_NUM_PROCESSES", "2"))

    mesh = distributed.make_global_mesh(tp=int(os.environ.get("WORKER_TP", "1")))
    venv = make_vec_env("CartPole-v1", num_envs=16, max_episode_steps=16)
    demos = experts.generate_expert_trajectories(
        "CartPole-v1", venv, min_episodes=2, seed=0
    )
    trainer = GAIL(
        demonstrations=demos,
        demo_batch_size=16,
        venv=venv,
        gen_config=PPOConfig(n_steps=8, n_minibatches=2, n_epochs=1),
        n_disc_updates_per_round=2,
        allow_variable_horizon=True,
        seed=0,
    )
    distributed.shard_adversarial_trainer_global(trainer, mesh)
    with mesh:
        trainer.train_fused(4 * trainer.gen_train_timesteps, rounds_per_sync=2)
        jax.block_until_ready(trainer.gen_state.variables)

    gen_flat = np.concatenate([
        np.ravel(np.asarray(jax.device_get(x)))
        for x in jax.tree.leaves(trainer.gen_state.variables)
    ])
    disc_flat = np.concatenate([
        np.ravel(np.asarray(jax.device_get(x)))
        for x in jax.tree.leaves(trainer.disc_state.variables)
    ])
    distributed.barrier("fused_done")
    np.savez(
        os.path.join(out_dir, f"fused_{pid}.npz"),
        gen=gen_flat,
        disc=disc_flat,
        n_updates=int(trainer.gen_state.n_updates),
        disc_step=int(trainer.disc_state.step),
    )


if __name__ == "__main__":
    main(sys.argv[1])

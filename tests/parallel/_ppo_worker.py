"""Worker for the multi-process PPO smoke test (see test_distributed.py).

Two processes x 4 virtual CPU devices run the framework's actual jitted PPO
train step over a device CartPole batch sharded across the GLOBAL dp axis.
Both processes must end with bit-identical replicated parameters.
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

from imitation_tpu.envs import make_vec_env  # noqa: E402
from imitation_tpu.models.policies import ActorCriticPolicy  # noqa: E402
from imitation_tpu.parallel import distributed  # noqa: E402
from imitation_tpu.rl.ppo import PPO, PPOConfig  # noqa: E402


def main(out_dir: str) -> None:
    distributed.initialize()
    pid = jax.process_index()
    assert jax.process_count() == int(os.environ.get("JAX_NUM_PROCESSES", "2"))

    mesh = distributed.make_global_mesh(tp=int(os.environ.get("WORKER_TP", "1")))
    venv = make_vec_env("CartPole-v1", num_envs=16, max_episode_steps=16)
    policy = ActorCriticPolicy(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
    )
    ppo = PPO(
        venv,
        policy,
        PPOConfig(n_steps=8, n_minibatches=2, n_epochs=1),
        seed=0,
    )
    state = ppo.init_state()  # identical on both processes (same seed)
    with mesh:
        tp = int(os.environ.get("WORKER_TP", "1"))
        state = distributed.shard_rl_state_global(state, mesh, tp_params=tp > 1)
        for _ in range(2):
            state, metrics = ppo._train_step_jit(state, None)
        jax.block_until_ready(state.variables)
        loss = float(np.asarray(jax.device_get(metrics["loss"])))

    flat = np.concatenate([
        np.ravel(np.asarray(jax.device_get(x)))
        for x in jax.tree.leaves(state.variables)
    ])
    distributed.barrier("ppo_done")
    np.savez(os.path.join(out_dir, f"ppo_{pid}.npz"), flat=flat, loss=loss)


if __name__ == "__main__":
    main(sys.argv[1])

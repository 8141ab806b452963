"""Tutorial 11: multi-chip GAIL — sharded fused training + cross-layout resume.

The reference is single-device; this is the capability it never had
(SURVEY §2.8). One GAIL trainer's full state (generator RLState, disc
state, replay ring, demo batch) is placed on a ``dp x tp``
`jax.sharding.Mesh`, the multi-round ``train_fused`` program runs sharded
(XLA inserts the dp-psums / tp-collectives from the shardings), and the
checkpoint saved from that layout restores onto a DIFFERENT mesh layout
and keeps training.

Runs identically on real TPU slices and on virtual CPU devices; with no
hardware mesh available it forces 8 virtual CPU devices.
"""

import os
import sys

if "jax" not in sys.modules:  # standalone run: build a virtual 8-device CPU mesh
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
import jax  # noqa: E402


def main(n_rounds: int = 8, tmp_dir: str = "/tmp/t11_ckpt") -> None:
    from imitation_tpu.algorithms.adversarial.gail import GAIL
    from imitation_tpu.envs import make_vec_env
    from imitation_tpu.parallel import mesh as mesh_mod
    from imitation_tpu.rl.ppo import PPOConfig
    from imitation_tpu.testing import experts
    from imitation_tpu.util.checkpoint import restore_state, save_state

    assert jax.device_count() >= 8, "need 8 (virtual) devices; see module docstring"

    venv = make_vec_env("CartPole-v1", num_envs=8, max_episode_steps=32)
    demos = experts.generate_expert_trajectories("CartPole-v1", venv, min_episodes=4)

    def build():
        return GAIL(
            demonstrations=demos,
            demo_batch_size=64,
            venv=venv,
            gen_config=PPOConfig(n_steps=16, n_minibatches=2, n_epochs=2),
            n_disc_updates_per_round=2,
            allow_variable_horizon=True,
            seed=0,
        )

    # --- train sharded over dp=4 x tp=2 ---------------------------------
    m42 = mesh_mod.make_mesh(dp=4, tp=2)
    trainer = build()
    mesh_mod.shard_adversarial_trainer(trainer, m42)
    with m42:
        trainer.train_fused(n_rounds * trainer.gen_train_timesteps, rounds_per_sync=4)
    print(
        f"trained {int(trainer.gen_state.n_updates)} gen updates / "
        f"{int(trainer.disc_state.step)} disc steps on mesh {dict(m42.shape)}"
    )
    save_state(os.path.join(tmp_dir, "gen"), trainer.gen_state)

    # --- resume the generator on a DIFFERENT layout (dp=8) --------------
    m8 = mesh_mod.make_mesh(dp=8, tp=1)
    resumed = build()
    template = resumed.gen_algo.init_state()
    gen_state = restore_state(os.path.join(tmp_dir, "gen"), template)
    with m8:
        resumed.gen_state = mesh_mod.shard_rl_state(gen_state, m8, tp_params=False)
        mesh_mod.shard_adversarial_trainer(resumed, m8, tp_params=False)
        resumed.train_fused(2 * resumed.gen_train_timesteps, rounds_per_sync=2)
    print(
        f"resumed on mesh {dict(m8.shape)}: gen updates now "
        f"{int(resumed.gen_state.n_updates)}"
    )


if __name__ == "__main__":
    main()

"""train_imitation: bc / dagger / sqil commands.

Counterpart of reference ``scripts/train_imitation.py`` (:57-186).

CLI: ``python -m imitation_tpu.scripts.train_imitation bc with
env_name=CartPole-v1 [fast]`` (commands: bc, dagger, sqil).
"""

from __future__ import annotations

import os
from typing import Any, Dict

from imitation_tpu.algorithms.bc import BC
from imitation_tpu.algorithms.dagger import SimpleDAggerTrainer
from imitation_tpu.algorithms.sqil import SQIL
from imitation_tpu.rl.dqn import DQNConfig
from imitation_tpu.scripts import ingredients
from imitation_tpu.scripts.config import Experiment

DEFAULT_CONFIG: Dict[str, Any] = {
    **ingredients.ENV_DEFAULTS,
    **ingredients.EVAL_DEFAULTS,
    "seed": 0,
    "log_root": os.path.join("output", "train_imitation"),
    "log_dir": None,
    "log_format_strs": ["stdout", "csv", "json"],
    "demonstrations": {"source": "generated", "n_expert_demos": 10, "path": None},
    "expert": {"policy_type": "scripted", "loader_kwargs": {}},
    # Warm-start: dir of a saved policy to initialize the learner from
    # (reference ingredients/bc.py:63-83 agent_path).
    "agent_path": None,
    "bc": {
        "batch_size": 32,
        "minibatch_size": None,
        "n_epochs": 10,
        "n_batches": None,
        "ent_weight": 1e-3,
        "l2_weight": 0.0,
        "learning_rate": 1e-3,
    },
    "dagger": {
        "total_timesteps": 4000,
        "rollout_round_min_episodes": 3,
        "rollout_round_min_timesteps": 500,
        # beta_schedule: "linear" (LinearBetaSchedule(rampdown_rounds)) or
        # "exponential" (ExponentialBetaSchedule(decay_probability)) —
        # reference dagger.py:28-96 / tuned_hps dagger_*.json.
        "beta_schedule": "linear",
        "rampdown_rounds": 15,
        "decay_probability": 0.7,
    },
    "sqil": {
        "total_timesteps": 10_000,
        "learning_starts": 500,
        "batch_size": 64,
        "learning_rate": 3e-4,
    },
}

ex = Experiment("train_imitation", DEFAULT_CONFIG)
ex.named_config("fast", {
    "num_envs": 2,
    "max_episode_steps": 20,
    "n_episodes_eval": 2,
    "demonstrations": {"n_expert_demos": 2},
    "bc": {"n_epochs": 1, "batch_size": 8},
    "dagger": {
        "total_timesteps": 100,
        "rollout_round_min_episodes": 1,
        "rollout_round_min_timesteps": 20,
    },
    "sqil": {"total_timesteps": 200, "learning_starts": 32, "batch_size": 16},
})


def _finish(policy_apply, variables, venv, config, logger, extra=None):
    stats = ingredients.eval_policy_stats(policy_apply, variables, venv, config)
    result = {"imit_stats": stats}
    if extra:
        result.update(extra)
    for k, v in stats.items():
        logger.record(f"imit_stats/{k}", v)
    logger.dump(0)
    return result


@ex.command("bc")
def bc_cmd(config: Dict[str, Any], run_dir: str, logger) -> Dict[str, Any]:
    venv = ingredients.make_venv_from_config(config)
    demos = ingredients.get_expert_trajectories(config, venv)
    bc_cfg = config["bc"]
    bc = BC(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
        demonstrations=demos,
        rng=config["seed"],
        batch_size=bc_cfg["batch_size"],
        minibatch_size=bc_cfg["minibatch_size"],
        ent_weight=bc_cfg["ent_weight"],
        l2_weight=bc_cfg["l2_weight"],
        optimizer_kwargs={"lr": bc_cfg["learning_rate"]},
        custom_logger=logger,
        allow_variable_horizon=True,
    )
    if config.get("agent_path"):
        import dataclasses

        from imitation_tpu.policies import serialize as policy_serialize

        _, warm_vars = policy_serialize.load_policy_from_path(config["agent_path"])
        bc.state = dataclasses.replace(bc.state, variables=warm_vars)
    bc.train(n_epochs=bc_cfg["n_epochs"], n_batches=bc_cfg["n_batches"])
    bc.save_policy(os.path.join(run_dir, "policies", "final"))
    return _finish(bc.policy.sample_fn(), bc.state.variables, venv, config, logger)


@ex.command("dagger")
def dagger_cmd(config: Dict[str, Any], run_dir: str, logger) -> Dict[str, Any]:
    venv = ingredients.make_venv_from_config(config)
    expert_apply, expert_params = ingredients.load_expert_policy(config, venv)
    d_cfg = config["dagger"]
    from imitation_tpu.algorithms.dagger import (
        ExponentialBetaSchedule,
        LinearBetaSchedule,
    )

    if d_cfg.get("beta_schedule", "linear") == "exponential":
        schedule = ExponentialBetaSchedule(d_cfg.get("decay_probability", 0.7))
    else:
        schedule = LinearBetaSchedule(d_cfg["rampdown_rounds"])
    bc_cfg = config["bc"]
    bc_trainer = BC(
        observation_space=venv.observation_space,
        action_space=venv.action_space,
        rng=config["seed"],
        batch_size=bc_cfg["batch_size"],
        minibatch_size=bc_cfg["minibatch_size"],
        ent_weight=bc_cfg["ent_weight"],
        l2_weight=bc_cfg["l2_weight"],
        optimizer_kwargs={"lr": bc_cfg["learning_rate"]},
        custom_logger=logger,
        allow_variable_horizon=True,
    )
    if config.get("agent_path"):
        # warm-start the DAgger robot policy (reference
        # test_train_dagger_warmstart / ingredients/bc.py:63-83)
        import dataclasses

        from imitation_tpu.policies import serialize as policy_serialize

        _, warm_vars = policy_serialize.load_policy_from_path(config["agent_path"])
        # Validate the checkpoint against the configured BC policy before
        # swapping it in — an architecture mismatch would otherwise surface
        # as an obscure shape error at the first apply.
        import jax

        cur = bc_trainer.state.variables
        cur_struct = jax.tree.structure(cur)
        warm_struct = jax.tree.structure(warm_vars)
        if cur_struct != warm_struct:
            raise ValueError(
                f"agent_path checkpoint has a different policy architecture: "
                f"parameter tree {warm_struct} does not match the configured "
                f"BC policy's {cur_struct}. Check policy hid_sizes / spaces."
            )
        mismatched = [
            str(path)
            for (path, a), b in zip(
                jax.tree_util.tree_leaves_with_path(cur), jax.tree.leaves(warm_vars)
            )
            if a.shape != b.shape
        ]
        if mismatched:
            raise ValueError(
                f"agent_path checkpoint parameter shapes do not match the "
                f"configured BC policy (obs/action spaces or hid_sizes "
                f"differ) at: {', '.join(mismatched)}"
            )
        bc_trainer.state = dataclasses.replace(bc_trainer.state, variables=warm_vars)
    trainer = SimpleDAggerTrainer(
        venv=venv,
        scratch_dir=os.path.join(run_dir, "scratch"),
        expert_policy_apply=expert_apply,
        expert_params=expert_params,
        rng=config["seed"],
        beta_schedule=schedule,
        bc_trainer=bc_trainer,
        custom_logger=logger,
    )
    trainer.train(
        total_timesteps=d_cfg["total_timesteps"],
        rollout_round_min_episodes=d_cfg["rollout_round_min_episodes"],
        rollout_round_min_timesteps=d_cfg["rollout_round_min_timesteps"],
        bc_train_kwargs={"n_epochs": config["bc"]["n_epochs"]},
    )
    trainer.save_trainer()
    return _finish(
        trainer.policy.sample_fn(), trainer.policy_variables, venv, config, logger
    )


@ex.command("sqil")
def sqil_cmd(config: Dict[str, Any], run_dir: str, logger) -> Dict[str, Any]:
    venv = ingredients.make_venv_from_config(config)
    demos = ingredients.get_expert_trajectories(config, venv)
    s_cfg = config["sqil"]
    from imitation_tpu.rl.sac import SACConfig

    sqil = SQIL(
        venv=venv,
        demonstrations=demos,
        # rl_algo "auto": DQN on discrete, SAC on continuous envs (the
        # reference accepts any OffPolicyAlgorithm; SQIL-SAC is its
        # continuous variant).
        dqn_config=DQNConfig(
            learning_starts=s_cfg["learning_starts"],
            batch_size=s_cfg["batch_size"],
            learning_rate=s_cfg["learning_rate"],
        ),
        sac_config=SACConfig(
            learning_starts=s_cfg["learning_starts"],
            batch_size=s_cfg["batch_size"],
            learning_rate=s_cfg["learning_rate"],
        ),
        custom_logger=logger,
        allow_variable_horizon=True,
        seed=config["seed"],
    )
    sqil.train(total_timesteps=s_cfg["total_timesteps"])
    return _finish(
        sqil.policy.sample_fn(), sqil.state.variables, venv, config, logger
    )


from imitation_tpu.scripts.tuned_hps import register_tuned_configs

register_tuned_configs(ex)


if __name__ == "__main__":
    ex.run_cli()

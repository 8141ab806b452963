"""train_rl: train an expert RL policy, save rollouts + checkpoints.

Counterpart of reference ``scripts/train_rl.py`` (:33-165): trains PPO (or
SAC) on the gym reward — or on a loaded learned reward for transfer
evaluation — saves rollouts for use as demonstrations, periodic policy
checkpoints, and final evaluation stats.

CLI: ``python -m imitation_tpu.scripts.train_rl with env_name=CartPole-v1
total_timesteps=100000 [fast] [sac] [reward_type=... reward_path=...]``
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np

from imitation_tpu.data import rollout as rollout_mod
from imitation_tpu.data import serialize
from imitation_tpu.models.policies import ActorCriticPolicy
from imitation_tpu.policies import serialize as policy_serialize
from imitation_tpu.rl.ppo import PPO, PPOConfig
from imitation_tpu.rl.sac import SAC, SACConfig
from imitation_tpu.scripts import ingredients
from imitation_tpu.scripts.config import Experiment

DEFAULT_CONFIG: Dict[str, Any] = {
    **ingredients.ENV_DEFAULTS,
    **ingredients.EVAL_DEFAULTS,
    "seed": 0,
    "log_root": os.path.join("output", "train_rl"),
    "log_dir": None,
    "log_format_strs": ["stdout", "csv", "json"],
    "total_timesteps": 100_000,
    "rl": {
        "algo": "ppo",
        # PPO defaults match reference ingredients/rl.py:34-66 (SB3 defaults)
        "n_steps": 2048 // 8,
        "batch_size": 64,
        "n_epochs": 10,
        "learning_rate": 3e-4,
        "ent_coef": 0.0,
        "gamma": 0.99,
        "gae_lambda": 0.95,
    },
    # transfer eval: relabel training reward with a saved reward net
    "reward_type": None,
    "reward_path": None,
    "normalize_reward": False,
    "rollout_save_n_timesteps": None,
    "rollout_save_n_episodes": 20,
    "policy_save_interval": 10_000,
    "policy_save_final": True,
    # Warm-start: dir of a saved policy to continue training from
    # (reference ingredients/rl.py:199-231 agent_path).
    "agent_path": None,
    # Policy architecture (reference policy ingredient: FeedForward32Policy
    # default, CnnPolicy for image envs).
    "policy": {"hid_sizes": [32, 32], "normalize_features": False,
               "features": "flatten"},
}

ex = Experiment("train_rl", DEFAULT_CONFIG)
ex.named_config("fast", {
    "total_timesteps": 2048,
    "num_envs": 4,
    "max_episode_steps": 50,
    "n_episodes_eval": 3,
    "rollout_save_n_episodes": 3,
    "rl": {"n_steps": 32, "batch_size": 32, "n_epochs": 2},
})
ex.named_config("sac", {"rl": {"algo": "sac"}})
ex.named_config("pendulum", {"env_name": "Pendulum-v1"})
ex.named_config("cartpole", {"env_name": "CartPole-v1"})
# CnnPolicy equivalent for image observations (reference train_rl
# policy=CnnPolicy runs, tests/scripts/test_scripts.py
# test_train_rl_cnn_policy).
ex.named_config("cnn_policy", {"policy": {"features": "nature_cnn"}})


@ex.main
def train_rl(config: Dict[str, Any], run_dir: str, logger) -> Dict[str, Any]:
    venv = ingredients.make_venv_from_config(config)
    rl_cfg = config["rl"]

    reward_fn = None
    reward_params = None
    if config["reward_type"] is not None:
        # Transfer evaluation of a learned reward (reference train_rl.py:106-115):
        # load the net directly so relabeling jits with the rollout.
        from imitation_tpu.rewards import serialize as reward_serialize

        apply, variables = reward_serialize.load_reward_apply(
            config["reward_type"], config["reward_path"]
        )

        def reward_fn(params, obs, acts, next_obs, dones):
            return apply(variables, obs, acts, next_obs, dones)

        if config["normalize_reward"] and config["reward_type"] == "RewardNet_normalized":
            import warnings

            warnings.warn(
                "Applying normalization to already normalized reward function. "
                "Consider setting normalize_reward as False",
                RuntimeWarning,
            )

    if rl_cfg.get("algo", "ppo") == "sac":
        sac = SAC(
            venv,
            SACConfig(learning_rate=rl_cfg.get("learning_rate", 3e-4)),
            seed=config["seed"],
        )
        state = sac.init_state()
        state = sac.learn(state, config["total_timesteps"], logger=logger)
        policy_apply = sac.sample_fn()
        variables_out = {"params": state.actor_params}
        save_variables = variables_out
        policy_obj = sac.policy
    else:
        pol_cfg = config.get("policy", {})
        policy = ActorCriticPolicy(
            observation_space=venv.observation_space,
            action_space=venv.action_space,
            hid_sizes=tuple(pol_cfg.get("hid_sizes", (32, 32))),
            normalize_features=pol_cfg.get("normalize_features", False),
            features=pol_cfg.get("features", "flatten"),
        )
        batch = rl_cfg["n_steps"] * venv.num_envs
        n_minibatches = max(1, batch // rl_cfg.get("batch_size", 64))
        ppo = PPO(
            venv,
            policy,
            PPOConfig(
                n_steps=rl_cfg["n_steps"],
                n_minibatches=n_minibatches,
                n_epochs=rl_cfg.get("n_epochs", 10),
                learning_rate=rl_cfg.get("learning_rate", 3e-4),
                ent_coef=rl_cfg.get("ent_coef", 0.0),
                gamma=rl_cfg.get("gamma", 0.99),
                gae_lambda=rl_cfg.get("gae_lambda", 0.95),
                # VecNormalize(norm_reward) equivalent (reference
                # train_rl.py:117-127).
                normalize_rewards=config["normalize_reward"],
            ),
            reward_fn=reward_fn,
            seed=config["seed"],
        )
        state = ppo.init_state()
        if config.get("agent_path"):
            _, warm_vars = policy_serialize.load_policy_from_path(
                config["agent_path"]
            )
            state = state.replace(variables=warm_vars)
        callback = None
        if config["policy_save_interval"] > 0:
            callback = policy_serialize.SavePolicyCallback(
                os.path.join(run_dir, "checkpoints"), policy,
                save_interval_updates=max(
                    1,
                    config["policy_save_interval"]
                    // (rl_cfg["n_steps"] * venv.num_envs),
                ),
            )
        state = ppo.learn(
            state, config["total_timesteps"], callback=callback, logger=logger
        )
        policy_apply = policy.sample_fn()
        variables_out = state.variables
        save_variables = state.variables
        policy_obj = policy

    # Save rollouts as demonstrations (reference train_rl.py:147-157).
    sample_until = rollout_mod.make_sample_until(
        min_timesteps=config["rollout_save_n_timesteps"],
        min_episodes=config["rollout_save_n_episodes"],
    )
    trajs = rollout_mod.generate_trajectories(
        policy_apply, variables_out, venv, sample_until, rng=config["seed"]
    )
    serialize.save(os.path.join(run_dir, "rollouts", "final"), trajs)

    if config["policy_save_final"] and policy_obj is not None:
        policy_serialize.save_policy(
            os.path.join(run_dir, "policies", "final"), policy_obj, save_variables
        )

    stats = ingredients.eval_policy_stats(policy_apply, variables_out, venv, config)
    for k, v in stats.items():
        logger.record(f"eval/{k}", v)
    logger.dump(int(np.asarray(state.timesteps)))
    return stats


if __name__ == "__main__":
    ex.run_cli()

"""Reusable script building blocks (the reference's Sacred "ingredients").

Counterparts of reference ``scripts/ingredients/*``: environment
construction (environment.py), expert loading (expert.py), demonstration
sourcing (demonstrations.py), policy evaluation (policy_evaluation.py).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Sequence

from imitation_tpu.data import rollout as rollout_mod
from imitation_tpu.data import serialize, types
from imitation_tpu.envs import make_vec_env
from imitation_tpu.envs.vector import VectorEnv
from imitation_tpu.policies import serialize as policy_serialize
from imitation_tpu.testing import experts as scripted_experts

ENV_DEFAULTS = {
    "env_name": "CartPole-v1",
    "num_envs": 8,  # reference default num_vec=8 (ingredients/environment.py:17)
    "max_episode_steps": None,
    # Extra kwargs forwarded to the env constructor (reference
    # ingredients/environment.py env_make_kwargs).
    "env_make_kwargs": {},
}

EVAL_DEFAULTS = {
    # reference ingredients/policy_evaluation.py:20 — 50 episodes
    "n_episodes_eval": 50,
}


def make_venv_from_config(config: Dict[str, Any]) -> VectorEnv:
    return make_vec_env(
        config["env_name"],
        num_envs=config.get("num_envs", 8),
        max_episode_steps=config.get("max_episode_steps"),
        **(config.get("env_make_kwargs") or {}),
    )


def load_expert_policy(config: Dict[str, Any], venv: VectorEnv):
    """Returns (policy_apply_fn, params) for the configured expert.

    expert.policy_type: "scripted" (closed-form controller), "ppo"/"sac"/
    "saved" (checkpoint dir via policy registry), "random", "zero"
    (reference ingredients/expert.py:28-66, minus the HF hub loaders —
    no network egress here).
    """
    expert_cfg = config.get("expert", {})
    policy_type = expert_cfg.get("policy_type", "scripted")
    if policy_type == "scripted":
        return scripted_experts.expert_for(config["env_name"]), {}
    loader_kwargs = dict(expert_cfg.get("loader_kwargs", {}))
    policy, variables = policy_serialize.load_policy(policy_type, venv, **loader_kwargs)
    return policy.sample_fn(), variables


def get_expert_trajectories(
    config: Dict[str, Any], venv: VectorEnv
) -> Sequence[types.TrajectoryWithRew]:
    """Demonstration sourcing (reference ingredients/demonstrations.py:30-97).

    demonstrations.source: "local" (load from path), "generated" (roll out
    the configured expert).
    """
    demo_cfg = config.get("demonstrations", {})
    source = demo_cfg.get("source", "generated")
    n_expert_demos = demo_cfg.get("n_expert_demos")
    if source == "local":
        path = demo_cfg["path"]
        if path is None:
            raise ValueError(
                "demonstrations.source='local' requires demonstrations.path"
            )
        if not os.path.exists(str(path)):
            raise FileNotFoundError(
                f"demonstrations.path {path!r} does not exist"
            )
        trajs = serialize.load(path)
    elif source == "generated":
        apply_fn, params = load_expert_policy(config, venv)
        n = n_expert_demos or 10
        trajs = rollout_mod.generate_trajectories(
            apply_fn,
            params,
            venv,
            rollout_mod.make_min_episodes(n),
            rng=config.get("seed", 0),
        )
    else:
        raise ValueError(f"unknown demonstrations.source {source!r}")
    if n_expert_demos is not None:
        if len(trajs) < n_expert_demos:
            raise ValueError(
                f"Want to use n_expert_demos={n_expert_demos} trajectories, but "
                f"only {len(trajs)} are available.",
            )
        trajs = list(trajs)[:n_expert_demos]
    return trajs


def eval_policy_stats(
    policy_apply,
    params,
    venv: VectorEnv,
    config: Dict[str, Any],
) -> Dict[str, float]:
    """Final policy evaluation (reference ingredients/policy_evaluation.py:30-72)."""
    n_episodes = config.get("n_episodes_eval", EVAL_DEFAULTS["n_episodes_eval"])
    trajs = rollout_mod.generate_trajectories(
        policy_apply,
        params,
        venv,
        rollout_mod.make_min_episodes(n_episodes),
        rng=config.get("seed", 0) + 1,
    )
    return dict(rollout_mod.rollout_stats(trajs))

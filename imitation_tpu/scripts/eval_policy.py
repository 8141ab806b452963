"""eval_policy: rollout statistics for a saved or scripted policy.

Counterpart of reference ``scripts/eval_policy.py`` (:55-128): rollout
stats, optional reward override (relabel with a learned reward for
reporting), optional exploration wrapper, rollout saving.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

from imitation_tpu.data import rollout as rollout_mod
from imitation_tpu.data import serialize
from imitation_tpu.scripts import ingredients
from imitation_tpu.scripts.config import Experiment

DEFAULT_CONFIG: Dict[str, Any] = {
    **ingredients.ENV_DEFAULTS,
    "seed": 0,
    "log_root": os.path.join("output", "eval_policy"),
    "log_dir": None,
    "log_format_strs": ["stdout", "csv", "json"],
    "expert": {"policy_type": "scripted", "loader_kwargs": {}},
    "eval_n_timesteps": None,
    "eval_n_episodes": 50,
    "rollout_save_path": None,
    "reward_type": None,
    "reward_path": None,
    "explore_kwargs": None,  # {"switch_prob":..., "random_prob":...}
    # Video recording (reference eval_policy.py videos/video_kwargs):
    # replays the policy in a render-capable gymnasium env and writes
    # mp4s (npz frame-dump fallback) under <run_dir>/videos.
    "videos": False,
    "video_kwargs": {},  # {"single_video": bool, "fps": int, "episodes": int}
}

ex = Experiment("eval_policy", DEFAULT_CONFIG)
ex.named_config("fast", {
    "num_envs": 2, "max_episode_steps": 20, "eval_n_episodes": 2,
})


@ex.main
def eval_policy(config: Dict[str, Any], run_dir: str, logger) -> Dict[str, Any]:
    venv = ingredients.make_venv_from_config(config)
    policy_apply, params = ingredients.load_expert_policy(config, venv)

    explore_kwargs = config.get("explore_kwargs")
    sample_until = rollout_mod.make_sample_until(
        min_timesteps=config["eval_n_timesteps"],
        min_episodes=config["eval_n_episodes"],
    )
    if explore_kwargs:
        from imitation_tpu.policies.exploration_wrapper import ExplorationWrapper
        import jax

        explorer = ExplorationWrapper(
            policy_apply, venv,
            random_prob=explore_kwargs.get("random_prob", 0.5),
            switch_prob=explore_kwargs.get("switch_prob", 0.5),
        )
        key = jax.random.key(config["seed"])
        key, k_reset, k_mode = jax.random.split(key, 3)
        env_state = venv.reset(k_reset)
        mode = explorer.initial_mode(k_mode)
        accum = rollout_mod.TrajectoryAccumulator(venv.num_envs)
        trajs = []
        collect_jit = jax.jit(explorer.collect, static_argnums=(3,))
        while not sample_until(trajs):
            key, sub = jax.random.split(key)
            env_state, mode, chunk = collect_jit(params, env_state, mode, 128, sub)
            trajs.extend(accum.add_chunk(chunk))
    else:
        trajs = rollout_mod.generate_trajectories(
            policy_apply, params, venv, sample_until, rng=config["seed"]
        )

    if config["rollout_save_path"]:
        serialize.save(config["rollout_save_path"], trajs)

    if config["reward_type"] is not None:
        # relabel reported rewards with a learned reward (reference :95-106)
        from imitation_tpu.rewards import serialize as reward_serialize

        fn = reward_serialize.load_reward(
            config["reward_type"], config["reward_path"], venv
        )
        relabeled = []
        for t in trajs:
            obs = np.asarray(t.obs)
            dones = np.zeros(len(t), np.float32)
            if t.terminal:
                dones[-1] = 1.0
            rews = fn(obs[:-1], t.acts, obs[1:], dones).astype(np.float64)
            relabeled.append(
                type(t)(obs=t.obs, acts=t.acts, infos=t.infos,
                        terminal=t.terminal, rews=rews)
            )
        trajs = relabeled

    if config["videos"]:
        _record_videos(config, run_dir, policy_apply, params)

    stats = dict(rollout_mod.rollout_stats(trajs))
    for k, v in stats.items():
        logger.record(k, v)
    logger.dump(0)
    return stats


def _record_videos(config, run_dir, policy_apply, params) -> None:
    """Replays the policy in a render-capable gymnasium env through
    VideoWrapper (reference eval_policy.py: video_wrapper post-wrapper)."""
    import gymnasium as gym
    import jax
    import numpy as np

    from imitation_tpu.util.video_wrapper import VideoWrapper

    vk = dict(config.get("video_kwargs") or {})
    episodes = vk.pop("episodes", 1)
    env = gym.make(config["env_name"], render_mode="rgb_array")
    if config.get("max_episode_steps"):
        env = gym.wrappers.TimeLimit(env, config["max_episode_steps"])
    video_dir = os.path.join(run_dir, "videos")
    env = VideoWrapper(env, directory=video_dir, **vk)
    key = jax.random.key(config["seed"])
    for episode in range(episodes):
        # Distinct seed per episode: seeding every reset identically would
        # record `episodes` copies of the same trajectory under a
        # deterministic policy (reference records distinct episodes).
        obs, _ = env.reset(seed=config["seed"] + episode)
        done = False
        while not done:
            key, sub = jax.random.split(key)
            acts, _ = policy_apply(params, np.asarray(obs)[None], sub)
            act = np.asarray(acts)[0]
            if np.issubdtype(np.asarray(env.action_space.sample()).dtype, np.integer):
                act = int(act)
            obs, _, term, trunc, _ = env.step(act)
            done = bool(term or trunc)
    env.close()


if __name__ == "__main__":
    ex.run_cli()

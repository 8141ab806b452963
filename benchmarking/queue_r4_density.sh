#!/bin/bash
# Waits for the RLHF CPU queue to finish, then reruns the Density evidence
# row at a larger RL budget (the 200k-step run landed at -718 on Pendulum;
# density reward is fixed after fitting, so more PPO steps is the lever).
set -u
cd /root/repo
LOG_DIR=output/r4
while ! grep -q "done pendulum true" "$LOG_DIR/rlhf_queue.log" 2>/dev/null; do sleep 30; done
echo "[densq] $(date +%H:%M:%S) start density 500k" >> "$LOG_DIR/rlhf_queue.log"
timeout 5400 python - > "$LOG_DIR/density_500k.log" 2>&1 << 'PYEOF'
import benchmarking.run_small_algos as rsa
import time
import numpy as np
from imitation_tpu.algorithms.density import DensityAlgorithm
from imitation_tpu.envs import make_vec_env
from imitation_tpu.rl.ppo import PPOConfig
from imitation_tpu.testing import experts

t0 = time.time()
venv = make_vec_env("Pendulum-v1", num_envs=16)
demos = experts.generate_expert_trajectories("Pendulum-v1", venv, min_episodes=20, seed=0)
algo = DensityAlgorithm(
    demonstrations=demos, venv=venv,
    rl_config=PPOConfig(n_steps=64, n_minibatches=8, n_epochs=10,
                        learning_rate=3e-4, gamma=0.95, gae_lambda=0.95),
    seed=0,
)
algo.train()
algo.train_policy(n_timesteps=500_000)
stats = algo.test_policy(n_trajectories=50, true_reward=True)
rsa._record("density/pendulum", float(stats["return_mean"]), 0, t0)
PYEOF
echo "[densq] $(date +%H:%M:%S) done density rc=$?" >> "$LOG_DIR/rlhf_queue.log"

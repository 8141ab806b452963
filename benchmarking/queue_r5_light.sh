#!/bin/bash
# Round-5 light lane: device-env (chip) runs that barely touch the host
# CPUs, safe to run alongside the MuJoCo-bound queue_r5.sh.
# VERDICT r3 items 3 + 7: RLHF pendulum to >=3 REAL seeds, true-PPO gate
# and the small-algo rows to 3 seeds each.
set -u
cd /root/repo
LOG_DIR=output/r5
mkdir -p "$LOG_DIR"
note() { echo "[q5l] $(date +%H:%M:%S) $1" | tee -a "$LOG_DIR/queue_light.log"; }

for s in 1 2; do
  note "rlhf pendulum s$s"
  timeout 1800 python -m benchmarking.run_rlhf --env pendulum --seed "$s" \
    > "$LOG_DIR/rlhf_pendulum_s${s}.log" 2>&1
  note "rlhf pendulum s$s rc=$?"
done
for s in 1 2; do
  note "rlhf_true_ppo pendulum s$s"
  timeout 1200 python -m benchmarking.run_rlhf --env pendulum --seed "$s" --true-baseline \
    > "$LOG_DIR/rlhf_true_pendulum_s${s}.log" 2>&1
  note "rlhf_true_ppo pendulum s$s rc=$?"
done
for s in 1 2; do
  note "small algos s$s"
  timeout 2400 python -m benchmarking.run_small_algos --seed "$s" \
    > "$LOG_DIR/small_algos_s${s}.log" 2>&1
  note "small algos s$s rc=$?"
done
note "light queue complete"

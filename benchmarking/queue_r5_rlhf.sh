#!/bin/bash
# RLHF seals/HalfCheetah at a doubled budget (VERDICT r3 item 3): 2M steps /
# 2000 comparisons / 40 iterations, 2 seeds, plus the same-budget true-PPO
# gate. Waits for the BC matrix lane to finish to cap CPU contention.
set -u
cd /root/repo
LOG_DIR=output/r5
note() { echo "[q5rlhf] $(date +%H:%M:%S) $1" | tee -a "$LOG_DIR/queue_rlhf.log"; }
while ! grep -q "bc matrix complete" "$LOG_DIR/queue_bc.log" 2>/dev/null; do sleep 60; done
note "true-ppo gate hc 2M"
timeout 3600 python -m benchmarking.run_rlhf --env seals_half_cheetah \
  --true-baseline --timesteps 2000000 --seed 0 \
  > "$LOG_DIR/rlhf_true_hc.log" 2>&1
note "true-ppo gate rc=$?"
for s in 0 1; do
  note "rlhf hc 2M s$s"
  timeout 4500 python -m benchmarking.run_rlhf --env seals_half_cheetah \
    --timesteps 2000000 --comparisons 2000 --iterations 40 --seed "$s" \
    > "$LOG_DIR/rlhf_hc_s${s}.log" 2>&1
  note "rlhf hc s$s rc=$?"
done
note "rlhf queue complete"

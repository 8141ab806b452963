#!/bin/bash
# Light lane, pass 2: density seeds at the uniform 500k budget, extra SQIL
# seeds (s2 landed at 156 — DQN variance; more seeds give an honest IQM),
# and an rlhf_true_ppo s0 with a real seed-0 run for the record.
set -u
cd /root/repo
LOG_DIR=output/r5
note() { echo "[q5l2] $(date +%H:%M:%S) $1" | tee -a "$LOG_DIR/queue_light.log"; }

for s in 1 2; do
  note "density 500k s$s"
  timeout 2400 python -m benchmarking.run_small_algos density --seed "$s" \
    > "$LOG_DIR/density500_s${s}.log" 2>&1
  note "density 500k s$s rc=$?"
done
for s in 3 4; do
  note "sqil s$s"
  timeout 1200 python -m benchmarking.run_small_algos sqil --seed "$s" \
    > "$LOG_DIR/sqil_s${s}.log" 2>&1
  note "sqil s$s rc=$?"
done
note "light2 complete"

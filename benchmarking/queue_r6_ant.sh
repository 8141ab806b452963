#!/bin/bash
# Dedicated Ant lane: 4 remaining Ant adversarial seeds, 65-min cap each
# so ALL FOUR fit before the hard end. Ant learning plateaus by ~4e6
# steps (gail s0 2410 @3.2e6 vs 2241 @5.9e6; airl s0 2850 @2.4e6), so a
# SIGTERM partial at ~4.5e6 records a plateau-level result (marked
# partial:true with its full learning history).
set -u
cd /root/repo
LOG_DIR=output/r5
note() { echo "[q6ant] $(date +%H:%M:%S) $1" | tee -a "$LOG_DIR/queue_ant.log"; }
run_ant() {
  local algo=$1 seed=$2
  local now; now=$(date +%s)
  if (( now > 1787348400 )); then note "skip $algo s$seed"; return; fi
  note "start $algo/seals_ant s$seed (timeout 3900)"
  timeout 3900 python -m benchmarking.run_parity "$algo" seals_ant --seed "$seed" \
    --total-timesteps 6000000 > "$LOG_DIR/${algo}_seals_ant_s${seed}.log" 2>&1
  note "done $algo/seals_ant s$seed rc=$?"
}
run_ant gail 1
run_ant airl 1
run_ant gail 2
run_ant airl 2
note "ant lane complete"

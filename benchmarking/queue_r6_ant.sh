#!/bin/bash
# Dedicated Ant lane: the 4 remaining Ant adversarial seeds at the 6e6
# cell budget. Ant learning plateaus by ~4e6 (histories), so a SIGTERM
# partial at the timeout still records a usable plateau-level result.
set -u
cd /root/repo
HARD_END=${QUEUE_HARD_END:-1787349600}
LOG_DIR=output/r5
note() { echo "[q6ant] $(date +%H:%M:%S) $1" | tee -a "$LOG_DIR/queue_ant.log"; }
run_ant() {
  local algo=$1 seed=$2
  local now; now=$(date +%s)
  local left=$(( HARD_END - now ))
  if (( left < 1800 )); then note "skip $algo s$seed (${left}s left)"; return; fi
  local tmo=$(( left < 5400 ? left : 5400 ))
  note "start $algo/seals_ant s$seed (timeout $tmo)"
  timeout "$tmo" python -m benchmarking.run_parity "$algo" seals_ant --seed "$seed" \
    --total-timesteps 6000000 > "$LOG_DIR/${algo}_seals_ant_s${seed}.log" 2>&1
  note "done $algo/seals_ant s$seed rc=$?"
}
run_ant gail 1
run_ant airl 1
run_ant gail 2
run_ant airl 2
note "ant lane complete"

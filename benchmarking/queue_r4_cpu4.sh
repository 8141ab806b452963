#!/bin/bash
set -u
cd /root/repo
LOG_DIR=output/r4
START=$(date +%s)
HARD_END=$(( START + 4500 ))
run() {
  local name=$1 tmo=$2; shift 2
  local now; now=$(date +%s)
  if (( now + tmo > HARD_END )); then
    echo "[cpuq4] $(date +%H:%M:%S) skip $name" >> "$LOG_DIR/cpu_queue.log"; return
  fi
  echo "[cpuq4] $(date +%H:%M:%S) start $name" >> "$LOG_DIR/cpu_queue.log"
  timeout "$tmo" "$@" > "$LOG_DIR/cpu4_${name}.log" 2>&1
  echo "[cpuq4] $(date +%H:%M:%S) done  $name rc=$?" >> "$LOG_DIR/cpu_queue.log"
}
run dagger_w2d_s3 3300 python -m benchmarking.run_parity_cpu dagger seals_walker2d --seed 3
run dagger_hopper_s5 2100 python -m benchmarking.run_parity_cpu dagger seals_hopper --seed 5
run dagger_swimmer_s5 2100 python -m benchmarking.run_parity_cpu dagger seals_swimmer --seed 5
run dagger_hc_s5 2100 python -m benchmarking.run_parity_cpu dagger seals_half_cheetah --seed 5
run dagger_hopper_s6 2100 python -m benchmarking.run_parity_cpu dagger seals_hopper --seed 6
run dagger_swimmer_s6 2100 python -m benchmarking.run_parity_cpu dagger seals_swimmer --seed 6

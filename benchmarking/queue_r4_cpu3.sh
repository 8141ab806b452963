#!/bin/bash
# Final CPU fill: extra DAgger seeds on the fast envs while the chip
# finishes its queue (serialized; generous timeouts; ends before round end).
set -u
cd /root/repo
LOG_DIR=output/r4
START=$(date +%s)
HARD_END=$(( START + 7200 ))
run() {
  local name=$1 tmo=$2; shift 2
  local now; now=$(date +%s)
  if (( now + tmo > HARD_END )); then
    echo "[cpuq3] $(date +%H:%M:%S) skip $name" >> "$LOG_DIR/cpu_queue.log"; return
  fi
  echo "[cpuq3] $(date +%H:%M:%S) start $name" >> "$LOG_DIR/cpu_queue.log"
  timeout "$tmo" "$@" > "$LOG_DIR/cpu3_${name}.log" 2>&1
  echo "[cpuq3] $(date +%H:%M:%S) done  $name rc=$?" >> "$LOG_DIR/cpu_queue.log"
}
run dagger_hopper_s3 2700 python -m benchmarking.run_parity_cpu dagger seals_hopper --seed 3
run dagger_swimmer_s3 2700 python -m benchmarking.run_parity_cpu dagger seals_swimmer --seed 3
run dagger_hc_s3 2700 python -m benchmarking.run_parity_cpu dagger seals_half_cheetah --seed 3
run dagger_hopper_s4 2700 python -m benchmarking.run_parity_cpu dagger seals_hopper --seed 4
run dagger_swimmer_s4 2700 python -m benchmarking.run_parity_cpu dagger seals_swimmer --seed 4
run dagger_hc_s4 2700 python -m benchmarking.run_parity_cpu dagger seals_half_cheetah --seed 4

#!/bin/bash
# Round-4 CPU-backend queue (runs nice'd, concurrent with the chip queue).
# Priorities: 1) the missing dagger/seals_ant cell, 2) BC rows to 10 seeds
# (full reference protocol), 3) DAgger rows to >=3 seeds, 4) DAgger toward
# 10 seeds as time allows.
set -u
cd /root/repo
START=$(date +%s)
HARD_END=${QUEUE_HARD_END:-$(( START + 24600 ))}
LOG_DIR=output/r4
mkdir -p "$LOG_DIR"

guard() {
  local now; now=$(date +%s)
  if (( now + $2 > HARD_END )); then
    echo "[cpuq] $(date +%H:%M:%S) skip $1" | tee -a "$LOG_DIR/cpu_queue.log"
    return 1
  fi
  echo "[cpuq] $(date +%H:%M:%S) start $1 (timeout $2)" | tee -a "$LOG_DIR/cpu_queue.log"
  return 0
}
fin() { echo "[cpuq] $(date +%H:%M:%S) done  $1 rc=$2" | tee -a "$LOG_DIR/cpu_queue.log"; }

runc() {
  local algo=$1 env=$2 seed=$3 tmo=$4; shift 4
  guard "$algo/$env s$seed" "$tmo" || return 0
  nice -n 19 timeout "$tmo" python -m benchmarking.run_parity_cpu "$algo" "$env" --seed "$seed" "$@" \
    > "$LOG_DIR/cpu_${algo}_${env}_s${seed}.log" 2>&1
  fin "$algo/$env s$seed" $?
}

# 1. Missing DAgger Ant cell.
runc dagger seals_ant 0 5400

# 2. BC to 10 seeds (cheap: ~30-90 s/cell on CPU).
for seed in 3 4 5 6 7 8 9; do
  for env in seals_walker2d seals_hopper seals_half_cheetah seals_swimmer seals_ant; do
    runc bc "$env" "$seed" 1200
  done
done

# 3. DAgger to >=3 seeds.
runc dagger seals_walker2d 1 3000
runc dagger seals_walker2d 2 3000
runc dagger seals_half_cheetah 2 2400
runc dagger seals_hopper 2 3000
runc dagger seals_swimmer 2 3000
runc dagger seals_ant 1 5400
runc dagger seals_ant 2 5400

# 4. DAgger toward 10 seeds.
for seed in 3 4 5 6 7 8 9; do
  for env in seals_half_cheetah seals_swimmer seals_walker2d seals_hopper seals_ant; do
    runc dagger "$env" "$seed" 3600
  done
done
echo "[cpuq] $(date +%H:%M:%S) r4 cpu queue complete" | tee -a "$LOG_DIR/cpu_queue.log"

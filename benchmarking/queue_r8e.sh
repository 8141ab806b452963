#!/bin/bash
# Round-5 chip lane, part 5: two more fresh-demo AIRL HalfCheetah seeds —
# the cell's seed variance ([-2921, -89, 861, 4015] at n=4) is the widest
# in the matrix, so each extra seed materially tightens the IQM. Then one
# final bench warm.
set -u
cd /root/repo
START=$(date +%s)
HARD_END=${QUEUE_HARD_END:-$((START + 7200))}
LOG_DIR=output/r8
PID_DIR=output/queue_pids
mkdir -p "$LOG_DIR" "$PID_DIR"
note() { echo "[q8e] $(date +%H:%M:%S) $1" | tee -a "$LOG_DIR/queue.log"; }

wait_bench() { while [ -f output/BENCH_RUNNING ]; do sleep 15; done; }

guard() {
  local now; now=$(date +%s)
  if (( now + $2 > HARD_END )); then note "skip $1 (past hard end)"; return 1; fi
  wait_bench
  note "start $1"
}

run_item() {
  local label=$1 est=$2 tmo=$3 logf=$4; shift 4
  guard "$label" "$est" || return 0
  setsid timeout "$tmo" "$@" > "$LOG_DIR/$logf" 2>&1 &
  local pid=$!
  echo "$pid" > "$PID_DIR/chip.pgid"
  wait "$pid"; local rc=$?
  rm -f "$PID_DIR/chip.pgid"
  note "done  $label rc=$rc"
}

HC_ENV="PARITY_EXPERTS_DIR=output/experts_v2"

run_item "airl/hc s4 (sac demos, 1e7)" 1500 2700 airl_hc_sac_s4.log \
  env $HC_ENV python -m benchmarking.run_parity airl seals_half_cheetah --seed 4
run_item "airl/hc s5 (sac demos, 1e7)" 1500 2700 airl_hc_sac_s5.log \
  env $HC_ENV python -m benchmarking.run_parity airl seals_half_cheetah --seed 5

wait_bench
note "final bench warm"
timeout 2400 python bench.py > "$LOG_DIR/bench_warm5.log" 2>&1
note "bench warm rc=$? — chip lane part 5 complete"

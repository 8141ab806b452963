#!/bin/bash
# Round-5 chip lane, part 4 (chained after queue_r9.sh): a third seed for
# the seals/HalfCheetah true-reward-PPO gate (the same-budget/same-HPs
# baseline the RLHF and PEBBLE rows are judged against — n=2 -> n=3),
# then a final bench re-warm so the driver's end-of-round bench stays
# cached. Same pgid-file/sentinel protocol as queue_r8.sh.
set -u
cd /root/repo
START=$(date +%s)
HARD_END=${QUEUE_HARD_END:-$((START + 3600))}
LOG_DIR=output/r9
PID_DIR=output/queue_pids
mkdir -p "$LOG_DIR" "$PID_DIR"
note() { echo "[q9b] $(date +%H:%M:%S) $1" | tee -a "$LOG_DIR/queue.log"; }

PREV_PID=${PREV_CHIP_PID:-1523}
while kill -0 "$PREV_PID" 2>/dev/null; do sleep 20; done
note "lane free (queue_r9 done)"

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

run_item "rlhf_true_ppo/hc s2 (2e6)" 900 1800 rlhf_true_hc_s2.log \
  python -m benchmarking.run_rlhf --env seals_half_cheetah --true-baseline \
    --timesteps 2000000 --seed 2

wait_bench
note "final bench re-warm"
timeout 1200 python bench.py > "$LOG_DIR/bench_warm_final.log" 2>&1
note "bench warm rc=$? — chip lane part 4 complete"

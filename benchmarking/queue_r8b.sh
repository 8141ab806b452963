#!/bin/bash
# Round-5 chip lane, part 2 (chained after queue_r8.sh): PEBBLE rows on
# seals/HalfCheetah (VERDICT r4 item 6) at 1e6 steps / 2000 comparisons —
# PEBBLE's sample-efficiency claim is made AGAINST the PPO-DRLHP rows'
# 2e6 budget, so the half budget is the point, not a shortcut. Then a
# final bench re-warm so the driver's end-of-round bench stays cached.
# Same pgid-file/sentinel protocol as queue_r8.sh.
set -u
cd /root/repo
START=$(date +%s)
HARD_END=${QUEUE_HARD_END:-$((START + 23400))}
LOG_DIR=output/r8
PID_DIR=output/queue_pids
mkdir -p "$LOG_DIR" "$PID_DIR"
note() { echo "[q8b] $(date +%H:%M:%S) $1" | tee -a "$LOG_DIR/queue.log"; }

PREV_PID=${PREV_CHIP_PID:-11039}
while kill -0 "$PREV_PID" 2>/dev/null; do sleep 30; done
note "lane free (queue_r8 done)"

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

run_item "pebble/hc s0 (1e6, 2000 cmp)" 3000 5400 pebble_hc_s0.log \
  python -m benchmarking.run_rlhf --pebble --env seals_half_cheetah \
    --timesteps 1000000 --comparisons 2000 --iterations 25 --seed 0
run_item "pebble/hc s1 (1e6, 2000 cmp)" 3000 5400 pebble_hc_s1.log \
  python -m benchmarking.run_rlhf --pebble --env seals_half_cheetah \
    --timesteps 1000000 --comparisons 2000 --iterations 25 --seed 1

wait_bench
note "re-warming bench after pebble"
timeout 2400 python bench.py > "$LOG_DIR/bench_warm2.log" 2>&1
note "bench warm rc=$? — chip lane part 2 complete"

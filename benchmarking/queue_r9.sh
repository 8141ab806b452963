#!/bin/bash
# Round-5 chip lane, part 3 (fresh machine after a mid-round host swap —
# compile caches were cold, bench re-warmed first): a third PEBBLE seed on
# seals/HalfCheetah (takes the PEBBLE sample-efficiency row from n=2 to
# n=3, matching the repo's own n>=3 floor for every matrix cell), then a
# final bench re-warm so the driver's end-of-round bench stays cached.
# Same pgid-file/sentinel protocol as queue_r8.sh / queue_r8b.sh.
set -u
cd /root/repo
START=$(date +%s)
HARD_END=${QUEUE_HARD_END:-$((START + 3300))}
LOG_DIR=output/r9
PID_DIR=output/queue_pids
mkdir -p "$LOG_DIR" "$PID_DIR"
note() { echo "[q9] $(date +%H:%M:%S) $1" | tee -a "$LOG_DIR/queue.log"; }

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

run_item "pebble/hc s2 (1e6, 2000 cmp)" 2300 3000 pebble_hc_s2.log \
  python -m benchmarking.run_rlhf --pebble --env seals_half_cheetah \
    --timesteps 1000000 --comparisons 2000 --iterations 25 --seed 2

wait_bench
note "re-warming bench after pebble s2"
timeout 1800 python bench.py > "$LOG_DIR/bench_warm3.log" 2>&1
note "bench warm rc=$? — chip lane part 3 complete"

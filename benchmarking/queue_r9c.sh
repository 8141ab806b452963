#!/bin/bash
# Round-5 chip lane, part 5: gail/seals_swimmer seed 9 — completes the
# reference's full 10-seed protocol (benchmarking/README.md:3-6) on this
# headline cell (seeds 0-8 already recorded, s8 partial). Then a final
# bench re-warm. Same pgid-file/sentinel protocol as queue_r8.sh.
set -u
cd /root/repo
START=$(date +%s)
HARD_END=${QUEUE_HARD_END:-$((START + 3600))}
LOG_DIR=output/r9
PID_DIR=output/queue_pids
mkdir -p "$LOG_DIR" "$PID_DIR"
note() { echo "[q9c] $(date +%H:%M:%S) $1" | tee -a "$LOG_DIR/queue.log"; }

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

run_item "gail/swimmer s9 (10-seed protocol)" 1600 3000 gail_swimmer_s9.log \
  python -m benchmarking.run_parity gail seals_swimmer --seed 9

wait_bench
note "post-swimmer bench re-warm"
timeout 1200 python bench.py > "$LOG_DIR/bench_warm4.log" 2>&1
note "bench warm rc=$? — chip lane part 5 complete"

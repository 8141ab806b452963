#!/bin/bash
# Round-5 chip lane, part 3 (chained after queue_r8b.sh): stretch seeds
# pushing the headline cells toward the reference's 10-seed protocol
# (swimmer/walker2d), and n=4 on the remaining adversarial cells. All
# guarded — whatever fits before the hard end runs; partial upserts make
# every cut run still land a row. Ends with a final bench re-warm.
set -u
cd /root/repo
START=$(date +%s)
HARD_END=${QUEUE_HARD_END:-$((START + 22800))}
LOG_DIR=output/r8
PID_DIR=output/queue_pids
mkdir -p "$LOG_DIR" "$PID_DIR"
note() { echo "[q8c] $(date +%H:%M:%S) $1" | tee -a "$LOG_DIR/queue.log"; }

PREV_PID=${PREV_CHIP_PID:-12273}
while kill -0 "$PREV_PID" 2>/dev/null; do sleep 30; done
note "lane free (queue_r8b done)"

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

run_item "gail/swimmer s8" 1400 2700 gail_swimmer_s8.log \
  python -m benchmarking.run_parity gail seals_swimmer --seed 8
run_item "airl/swimmer s4" 1200 2700 airl_swimmer_s4.log \
  python -m benchmarking.run_parity airl seals_swimmer --seed 4
run_item "gail/walker2d s6" 2400 3900 gail_walker2d_s6.log \
  python -m benchmarking.run_parity gail seals_walker2d --seed 6
run_item "gail/hopper s3" 1500 3000 gail_hopper_s3.log \
  python -m benchmarking.run_parity gail seals_hopper --seed 3
run_item "airl/hopper s3" 1500 3000 airl_hopper_s3.log \
  python -m benchmarking.run_parity airl seals_hopper --seed 3
run_item "gail/swimmer s9" 1400 2700 gail_swimmer_s9.log \
  python -m benchmarking.run_parity gail seals_swimmer --seed 9
run_item "airl/walker2d s4" 2400 3900 airl_walker2d_s4.log \
  python -m benchmarking.run_parity airl seals_walker2d --seed 4

wait_bench
note "re-warming bench after stretch seeds"
timeout 2400 python bench.py > "$LOG_DIR/bench_warm3.log" 2>&1
note "bench warm rc=$? — chip lane part 3 complete"

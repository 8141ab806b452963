#!/bin/bash
# Round-5 chip lane, part 4 (chained after queue_r8b.sh; replaces the
# r8/r8c stretch order): 4th seeds on the fresh-demo HalfCheetah cells
# (high seed variance — gail 1135-1975, airl -2921-4015 — so each seed
# materially tightens the IQM), then swimmer/walker2d stretch toward the
# 10-seed protocol, then a final bench re-warm.
set -u
cd /root/repo
START=$(date +%s)
HARD_END=${QUEUE_HARD_END:-$((START + 18000))}
LOG_DIR=output/r8
PID_DIR=output/queue_pids
mkdir -p "$LOG_DIR" "$PID_DIR"
note() { echo "[q8d] $(date +%H:%M:%S) $1" | tee -a "$LOG_DIR/queue.log"; }

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

HC_ENV="PARITY_EXPERTS_DIR=output/experts_v2"

run_item "gail/hc s3 (sac demos, 1e7)" 1800 3000 gail_hc_sac_s3.log \
  env $HC_ENV python -m benchmarking.run_parity gail seals_half_cheetah --seed 3
run_item "airl/hc s3 (sac demos, 1e7)" 1500 3000 airl_hc_sac_s3.log \
  env $HC_ENV python -m benchmarking.run_parity airl seals_half_cheetah --seed 3
run_item "gail/swimmer s6" 1500 2700 gail_swimmer_s6.log \
  python -m benchmarking.run_parity gail seals_swimmer --seed 6
run_item "gail/swimmer s7" 1500 2700 gail_swimmer_s7.log \
  python -m benchmarking.run_parity gail seals_swimmer --seed 7
run_item "gail/walker2d s5" 2400 3900 gail_walker2d_s5.log \
  python -m benchmarking.run_parity gail seals_walker2d --seed 5
run_item "airl/walker2d s3" 2400 3900 airl_walker2d_s3.log \
  python -m benchmarking.run_parity airl seals_walker2d --seed 3
run_item "airl/swimmer s3" 1400 2700 airl_swimmer_s3.log \
  python -m benchmarking.run_parity airl seals_swimmer --seed 3

wait_bench
note "re-warming bench after part 4"
timeout 2400 python bench.py > "$LOG_DIR/bench_warm4.log" 2>&1
note "bench warm rc=$? — chip lane part 4 complete"

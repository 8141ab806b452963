#!/bin/bash
# Round-5 chip lane, part 6: two more fresh-demo GAIL HalfCheetah seeds
# (cell at n=4 with a 212.7 outlier — more seeds tighten the IQM), then
# the final bench warm of the round.
set -u
cd /root/repo
START=$(date +%s)
HARD_END=${QUEUE_HARD_END:-$((START + 5400))}
LOG_DIR=output/r8
PID_DIR=output/queue_pids
mkdir -p "$LOG_DIR" "$PID_DIR"
note() { echo "[q8f] $(date +%H:%M:%S) $1" | tee -a "$LOG_DIR/queue.log"; }
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

run_item "gail/hc s4 (sac demos, 1e7)" 1800 2700 gail_hc_sac_s4.log \
  env $HC_ENV python -m benchmarking.run_parity gail seals_half_cheetah --seed 4
run_item "gail/hc s5 (sac demos, 1e7)" 1800 2700 gail_hc_sac_s5.log \
  env $HC_ENV python -m benchmarking.run_parity gail seals_half_cheetah --seed 5

wait_bench
note "final bench warm of the round"
timeout 2400 python bench.py > "$LOG_DIR/bench_warm6.log" 2>&1
note "bench warm rc=$? — chip lane part 6 complete"

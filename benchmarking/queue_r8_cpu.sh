#!/bin/bash
# Round-5 CPU lane. Waits for the in-flight dagger/seals_ant s2 job, then
# contributes the third fresh-demo GAIL HalfCheetah seed on the CPU
# backend (math identical, slower — kill-proof partial upserts mean even
# a cut run records a late-curve row), then stretch DAgger Ant seed 3.
# Process-group file protocol: see queue_r8.sh.
set -u
cd /root/repo
START=$(date +%s)
HARD_END=${QUEUE_HARD_END:-$((START + 21600))}
LOG_DIR=output/r8
PID_DIR=output/queue_pids
mkdir -p "$LOG_DIR" "$PID_DIR"
note() { echo "[q8cpu] $(date +%H:%M:%S) $1" | tee -a "$LOG_DIR/queue_cpu.log"; }

PREV_PID=${PREV_CPU_PID:-10007}
while kill -0 "$PREV_PID" 2>/dev/null; do sleep 30; done
note "lane free (prev pid $PREV_PID exited)"

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
  echo "$pid" > "$PID_DIR/cpu.pgid"
  wait "$pid"; local rc=$?
  rm -f "$PID_DIR/cpu.pgid"
  note "done  $label rc=$rc"
}

run_item "gail/hc s2 cpu (sac demos, 1e7)" 3600 14400 cpu_gail_hc_sac_s2.log \
  env PARITY_EXPERTS_DIR=output/experts_v2 \
  python -m benchmarking.run_parity_cpu gail seals_half_cheetah --seed 2
run_item "dagger/ant s3 cpu" 3600 7200 cpu_dagger_ant_s3.log \
  python -m benchmarking.run_parity_cpu dagger seals_ant --seed 3
note "cpu lane complete"

#!/bin/bash
# Round-5 CPU lane, part 2 (chained after queue_r8_cpu.sh): cheap CPU
# cells — Pendulum RLHF + its true-PPO gate to n=5 each (each run is
# ~5-15 min on the CPU backend), then dagger/walker2d s4 (-> n=5).
set -u
cd /root/repo
START=$(date +%s)
HARD_END=${QUEUE_HARD_END:-$((START + 16200))}
LOG_DIR=output/r8
PID_DIR=output/queue_pids
mkdir -p "$LOG_DIR" "$PID_DIR"
note() { echo "[q8cpu2] $(date +%H:%M:%S) $1" | tee -a "$LOG_DIR/queue_cpu.log"; }

PREV_PID=${PREV_CPU_PID:-11031}
while kill -0 "$PREV_PID" 2>/dev/null; do sleep 30; done
note "lane free (queue_r8_cpu done)"

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

run_item "rlhf/pendulum s3 cpu" 1500 2700 cpu_rlhf_pendulum_s3.log \
  python -m benchmarking.run_rlhf --env pendulum --seed 3 --backend cpu
run_item "rlhf_true/pendulum s3 cpu" 900 1800 cpu_rlhf_true_pendulum_s3.log \
  python -m benchmarking.run_rlhf --env pendulum --true-baseline --seed 3 --backend cpu
run_item "rlhf/pendulum s4 cpu" 1500 2700 cpu_rlhf_pendulum_s4.log \
  python -m benchmarking.run_rlhf --env pendulum --seed 4 --backend cpu
run_item "rlhf_true/pendulum s4 cpu" 900 1800 cpu_rlhf_true_pendulum_s4.log \
  python -m benchmarking.run_rlhf --env pendulum --true-baseline --seed 4 --backend cpu
run_item "dagger/walker2d s4 cpu" 5400 9000 cpu_dagger_walker2d_s4.log \
  python -m benchmarking.run_parity_cpu dagger seals_walker2d --seed 4
note "cpu lane part 2 complete"

#!/bin/bash
# Runs after queue_r3.sh finishes, in priority order with per-item guards:
# 1. bench.py warm run — populates the compile cache so the driver's
#    end-of-round bench doesn't stall on cold compiles through the tunnel.
# 2. dagger walker2d rerun — timed out at 2400s with BC rollout mean ~3110
#    (expert 3196); needs ~50 min.
# 3. bench_fused — validates the fused-path fix on the chip.
set -u
cd /root/repo
QUEUE_PID=${1:?usage: queue_r3_followup.sh <queue_pid> <hard_end_epoch>}
HARD_END=${2:?}
LOG_DIR=output/r3
mkdir -p "$LOG_DIR"

while kill -0 "$QUEUE_PID" 2>/dev/null; do sleep 30; done
echo "[followup] $(date +%H:%M:%S) queue done" | tee -a "$LOG_DIR/queue.log"

left() { echo $(( HARD_END - $(date +%s) )); }
run_item() {
  local name=$1 tmo=$2; shift 2
  if (( $(left) < tmo + 120 )); then
    echo "[followup] $(date +%H:%M:%S) skip $name (would overrun)" | tee -a "$LOG_DIR/queue.log"
    return 1
  fi
  echo "[followup] $(date +%H:%M:%S) start $name" | tee -a "$LOG_DIR/queue.log"
  timeout "$tmo" "$@" > "$LOG_DIR/$name.log" 2>&1
  echo "[followup] $(date +%H:%M:%S) done $name rc=$?" | tee -a "$LOG_DIR/queue.log"
}

run_item bench_warm 1500 python bench.py
run_item dagger_walker2d_retry 3000 python -m benchmarking.run_parity dagger seals_walker2d --seed 0
run_item bench_fused2 1500 python -m benchmarking.bench_fused
run_item bc_ant_s1 1200 python -m benchmarking.run_parity bc seals_ant --seed 1
echo "[followup] $(date +%H:%M:%S) complete" | tee -a "$LOG_DIR/queue.log"

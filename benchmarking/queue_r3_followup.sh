#!/bin/bash
# Runs after queue_r3.sh exits, in priority order with per-item guards:
# 1. bench.py warm run — populates the compile cache so the driver's
#    end-of-round bench doesn't stall on cold compiles through the tunnel.
# 2. AIRL HalfCheetah 6e6 — chip-worthy adversarial matrix cell (BC/DAgger
#    cells run on the CPU backend concurrently; see run_parity_cpu).
# 3. bench_fused — validates the fused-path fix on the chip.
set -u
cd /root/repo
QUEUE_PID=${1:?usage: queue_r3_followup.sh <queue_pid> <hard_end_epoch>}
HARD_END=${2:?}
LOG_DIR=output/r3
mkdir -p "$LOG_DIR"

while kill -0 "$QUEUE_PID" 2>/dev/null; do sleep 20; done
echo "[followup] $(date +%H:%M:%S) queue done" | tee -a "$LOG_DIR/queue.log"

left() { echo $(( HARD_END - $(date +%s) )); }
run_item() {
  local name=$1 tmo=$2; shift 2
  if (( $(left) < tmo / 2 )); then
    echo "[followup] $(date +%H:%M:%S) skip $name" | tee -a "$LOG_DIR/queue.log"
    return 1
  fi
  local eff=$tmo
  if (( $(left) - 60 < tmo )); then eff=$(( $(left) - 60 )); fi
  echo "[followup] $(date +%H:%M:%S) start $name (timeout $eff)" | tee -a "$LOG_DIR/queue.log"
  timeout "$eff" "$@" > "$LOG_DIR/$name.log" 2>&1
  echo "[followup] $(date +%H:%M:%S) done $name rc=$?" | tee -a "$LOG_DIR/queue.log"
}

run_item bench_warm 1500 python bench.py
run_item bench_kernels2 600 python -m benchmarking.bench_kernels
run_item airl_half_cheetah 4500 python -m benchmarking.run_parity airl seals_half_cheetah --seed 0 --total-timesteps 6000000
run_item bench_fused2 1500 python -m benchmarking.bench_fused
echo "[followup] $(date +%H:%M:%S) complete" | tee -a "$LOG_DIR/queue.log"

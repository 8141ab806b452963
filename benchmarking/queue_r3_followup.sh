#!/bin/bash
# Runs after queue_r3.sh finishes: kernel micro-bench (rewritten DMA-ring
# kernel), bench.py compile-cache warm-up (so the driver's end-of-round bench
# starts warm), then the RLHF long run if time remains.
set -u
cd /root/repo
QUEUE_PID=${1:?usage: queue_r3_followup.sh <queue_pid> <hard_end_epoch>}
HARD_END=${2:?}
LOG_DIR=output/r3
mkdir -p "$LOG_DIR"

# Wait for the queue process to exit (poll; not our child so can't `wait`).
while kill -0 "$QUEUE_PID" 2>/dev/null; do sleep 30; done
echo "[followup] $(date +%H:%M:%S) queue done" | tee -a "$LOG_DIR/queue.log"

left() { echo $(( HARD_END - $(date +%s) )); }

if (( $(left) > 2000 )); then
  echo "[followup] $(date +%H:%M:%S) start bench_fused" | tee -a "$LOG_DIR/queue.log"
  timeout 1800 python -m benchmarking.bench_fused > "$LOG_DIR/bench_fused2.log" 2>&1
  echo "[followup] $(date +%H:%M:%S) done bench_fused rc=$?" | tee -a "$LOG_DIR/queue.log"
fi

if (( $(left) > 1500 )); then
  echo "[followup] $(date +%H:%M:%S) start bench_kernels" | tee -a "$LOG_DIR/queue.log"
  timeout 1200 python -m benchmarking.bench_kernels > "$LOG_DIR/bench_kernels2.log" 2>&1
  echo "[followup] $(date +%H:%M:%S) done bench_kernels rc=$?" | tee -a "$LOG_DIR/queue.log"
fi

if (( $(left) > 1200 )); then
  echo "[followup] $(date +%H:%M:%S) start bench_warm" | tee -a "$LOG_DIR/queue.log"
  timeout 1100 python bench.py > "$LOG_DIR/bench_warm.log" 2>&1
  echo "[followup] $(date +%H:%M:%S) done bench_warm rc=$?" | tee -a "$LOG_DIR/queue.log"
fi

if (( $(left) > 2400 )); then
  echo "[followup] $(date +%H:%M:%S) start rlhf (budget-limited)" | tee -a "$LOG_DIR/queue.log"
  timeout $(( $(left) - 300 )) python -m benchmarking.run_rlhf --timesteps 200000 --comparisons 400 \
    > "$LOG_DIR/rlhf_pendulum.log" 2>&1
  echo "[followup] $(date +%H:%M:%S) done rlhf rc=$?" | tee -a "$LOG_DIR/queue.log"
fi
echo "[followup] $(date +%H:%M:%S) complete" | tee -a "$LOG_DIR/queue.log"

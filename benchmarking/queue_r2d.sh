#!/bin/bash
# Round-2 queue phase 3: dagger reruns (post device_put/constant fixes),
# RLHF long run, fused + kernel benches, then leftover seeds.
set -u
cd /root/repo
DEADLINE=${QUEUE_DEADLINE:-$(( $(date +%s) + 14400 ))}
LOG_DIR=output/r2
mkdir -p "$LOG_DIR"

guard() {
  local now; now=$(date +%s)
  if (( now >= DEADLINE )); then
    echo "[queue] deadline passed, skipping $1" | tee -a "$LOG_DIR/queue.log"
    return 1
  fi
  echo "[queue] $(date +%H:%M:%S) start $1" | tee -a "$LOG_DIR/queue.log"
  return 0
}
fin() { echo "[queue] $(date +%H:%M:%S) done  $1 rc=$2" | tee -a "$LOG_DIR/queue.log"; }

runp() {
  local algo=$1 env=$2 seed=$3 tmo=$4
  guard "$algo/$env s$seed" || return 0
  timeout "$tmo" python -m benchmarking.run_parity "$algo" "$env" --seed "$seed" \
    > "$LOG_DIR/${algo}_${env}_s${seed}.log" 2>&1
  fin "$algo/$env s$seed" $?
}

runp dagger seals_swimmer 0 3000
runp dagger seals_walker2d 0 3000
if guard rlhf_pendulum_longrun; then
  timeout 4800 python -m benchmarking.run_rlhf > "$LOG_DIR/rlhf_pendulum.log" 2>&1
  fin rlhf_pendulum_longrun $?
fi
if guard bench_fused; then
  timeout 1800 python -m benchmarking.bench_fused > "$LOG_DIR/bench_fused.log" 2>&1
  fin bench_fused $?
fi
if guard bench_kernels; then
  timeout 1800 python -m benchmarking.bench_kernels > "$LOG_DIR/bench_kernels.log" 2>&1
  fin bench_kernels $?
fi
# bc seed retries — compiles are cached by earlier attempts, so these are
# cheap even if the first pass timed out mid-compile.
runp bc seals_walker2d 1 1200
runp bc seals_hopper 1 1200
runp bc seals_half_cheetah 1 1200
runp bc seals_swimmer 1 1200
runp bc seals_walker2d 2 1200
runp bc seals_hopper 2 1200
runp bc seals_half_cheetah 2 1200
runp bc seals_swimmer 2 1200
echo "[queue] $(date +%H:%M:%S) r2d complete" | tee -a "$LOG_DIR/queue.log"

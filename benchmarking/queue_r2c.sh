#!/bin/bash
# Round-2 parity queue, phase 2 (after the host-collector device_put fix).
# STRICTLY serialized TPU use: one item at a time, nothing else touches the
# chip while this runs.
set -u
cd /root/repo
DEADLINE=${QUEUE_DEADLINE:-$(( $(date +%s) + 18000 ))}
LOG_DIR=output/r2
mkdir -p "$LOG_DIR"

run() {
  local algo=$1 env=$2 seed=$3 tmo=$4
  local now; now=$(date +%s)
  if (( now >= DEADLINE )); then
    echo "[queue] deadline passed, skipping $algo/$env s$seed" | tee -a "$LOG_DIR/queue.log"
    return
  fi
  echo "[queue] $(date +%H:%M:%S) start $algo/$env s$seed (timeout ${tmo}s)" | tee -a "$LOG_DIR/queue.log"
  timeout "$tmo" python -m benchmarking.run_parity "$algo" "$env" --seed "$seed" \
    > "$LOG_DIR/${algo}_${env}_s${seed}.log" 2>&1
  echo "[queue] $(date +%H:%M:%S) done  $algo/$env s$seed rc=$?" | tee -a "$LOG_DIR/queue.log"
}

run dagger seals_swimmer 0 2400
run dagger seals_walker2d 0 2400
# RLHF fast CLI probe on the chip (serialized this time)
echo "[queue] $(date +%H:%M:%S) start rlhf_fast_probe" | tee -a "$LOG_DIR/queue.log"
timeout 900 python -m imitation_tpu train_preference_comparisons with env_name=Pendulum-v1 fast \
  > "$LOG_DIR/rlhf_fast_probe.log" 2>&1
echo "[queue] $(date +%H:%M:%S) done  rlhf_fast_probe rc=$?" | tee -a "$LOG_DIR/queue.log"
run bc seals_walker2d 1 900
run bc seals_hopper 1 900
run bc seals_half_cheetah 1 900
run bc seals_swimmer 1 900
run gail seals_half_cheetah 0 5400
run airl seals_half_cheetah 0 5400
run airl seals_hopper 0 5400
run bc seals_walker2d 2 900
run bc seals_hopper 2 900
run bc seals_half_cheetah 2 900
run bc seals_swimmer 2 900
run gail seals_swimmer 0 5400
run airl seals_swimmer 0 5400
run dagger seals_ant 0 3600
run bc seals_ant 1 1500
run bc seals_ant 2 1500
run gail seals_ant 0 7200
run airl seals_ant 0 7200
echo "[queue] $(date +%H:%M:%S) queue complete" | tee -a "$LOG_DIR/queue.log"

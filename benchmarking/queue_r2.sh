#!/bin/bash
# Round-2 parity queue: fill the {bc,dagger,gail,airl} x 5 seals matrix
# (VERDICT next-round item 1), priority order per the judge's guidance.
# Serial: one real TPU chip, 2 vCPUs. Each item under timeout; no new item
# starts after the deadline so the driver's end-of-round bench.py gets the
# chip back.
set -u
cd /root/repo
DEADLINE=${QUEUE_DEADLINE:-$(( $(date +%s) + 24300 ))}   # default ~6.75h
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

# -- fast fills: swimmer column unlocked by the new 311-return expert -------
# bc seals_swimmer s0 already run directly (305.9)
run dagger seals_swimmer 0 2400
run dagger seals_walker2d 0 2400
# -- extra seeds on cheap cells (>=3 seeds for BC row) ----------------------
run bc seals_walker2d 1 900
run bc seals_hopper 1 900
run bc seals_half_cheetah 1 900
run bc seals_swimmer 1 900
run bc seals_walker2d 2 900
run bc seals_hopper 2 900
run bc seals_half_cheetah 2 900
run bc seals_swimmer 2 900
# -- adversarial fills at tuned HPs, reference 1e7 budget -------------------
run gail seals_half_cheetah 0 5400
run airl seals_half_cheetah 0 5400
run airl seals_hopper 0 5400
run gail seals_swimmer 0 5400
run airl seals_swimmer 0 5400
# -- remaining matrix cells (ant is slowest: per-env threaded MjData) -------
run dagger seals_ant 0 3600
run bc seals_ant 1 1500
run bc seals_ant 2 1500
run gail seals_ant 0 7200
run airl seals_ant 0 7200
# -- extra seeds on headline adversarial cells if time remains --------------
run gail seals_walker2d 1 5400
run airl seals_walker2d 1 5400
run dagger seals_half_cheetah 1 2400
run dagger seals_hopper 1 2400
echo "[queue] $(date +%H:%M:%S) queue complete" | tee -a "$LOG_DIR/queue.log"

#!/bin/bash
# Round-5 heavy lane, part 2 (non-Ant): finish the v2-expert cheetah
# column, then the headline 1e7-budget seeds. Ant runs in a parallel lane
# (queue_r6_ant.sh) — 2-core contention beats serial skips at the
# HARD_END. Stretch items last.
set -u
cd /root/repo
START=$(date +%s)
HARD_END=${QUEUE_HARD_END:-1787349600}   # 22:00 UTC
LOG_DIR=output/r5
mkdir -p "$LOG_DIR"
guard() {
  local now; now=$(date +%s)
  if (( now + $2 > HARD_END )); then
    echo "[q6] $(date +%H:%M:%S) skip $1" | tee -a "$LOG_DIR/queue.log"; return 1
  fi
  echo "[q6] $(date +%H:%M:%S) start $1" | tee -a "$LOG_DIR/queue.log"
}
fin() { echo "[q6] $(date +%H:%M:%S) done  $1 rc=$2" | tee -a "$LOG_DIR/queue.log"; }
runp() {
  local algo=$1 env=$2 seed=$3 est=$4 tmo=$5; shift 5
  guard "$algo/$env s$seed" "$est" || return 0
  timeout "$tmo" python -m benchmarking.run_parity "$algo" "$env" --seed "$seed" "$@" \
    > "$LOG_DIR/${algo}_${env}_s${seed}.log" 2>&1
  fin "$algo/$env s$seed" $?
}

export PARITY_EXPERTS_DIR=output/experts_v2
runp bc seals_half_cheetah 7 180 600
runp bc seals_half_cheetah 8 180 600
runp bc seals_half_cheetah 9 180 600
runp dagger seals_half_cheetah 0 900 2100
runp dagger seals_half_cheetah 1 900 2100
runp dagger seals_half_cheetah 2 900 2100
unset PARITY_EXPERTS_DIR

runp gail seals_swimmer 2 1700 3000
runp gail seals_swimmer 3 1700 3000
runp gail seals_swimmer 4 1700 3000
runp gail seals_walker2d 2 1900 3300
runp gail seals_walker2d 3 1900 3300

# stretch
export PARITY_EXPERTS_DIR=output/experts_v2
runp dagger seals_half_cheetah 3 900 2100
runp dagger seals_half_cheetah 4 900 2100
unset PARITY_EXPERTS_DIR
runp gail seals_walker2d 4 1900 3300
runp gail seals_swimmer 0 1700 3000
runp gail seals_swimmer 1 1700 3000
echo "[q6] $(date +%H:%M:%S) queue complete" | tee -a "$LOG_DIR/queue.log"

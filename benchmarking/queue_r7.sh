#!/bin/bash
# Round-4 chip lane: finish gail/walker2d to 5 seeds at 1e7 (the one
# headline cell still at 4), strengthen RLHF HalfCheetah to 3 seeds and
# its true-PPO gate to 2, then stretch seeds on the thinnest IQM cells.
# Every item either completes or records a SIGTERM partial with history.
set -u
cd /root/repo
START=$(date +%s)
HARD_END=${QUEUE_HARD_END:-$((START + 19800))}
LOG_DIR=output/r6
mkdir -p "$LOG_DIR"
guard() {
  local now; now=$(date +%s)
  if (( now + $2 > HARD_END )); then
    echo "[q7] $(date +%H:%M:%S) skip $1" | tee -a "$LOG_DIR/queue.log"; return 1
  fi
  echo "[q7] $(date +%H:%M:%S) start $1" | tee -a "$LOG_DIR/queue.log"
}
fin() { echo "[q7] $(date +%H:%M:%S) done  $1 rc=$2" | tee -a "$LOG_DIR/queue.log"; }
runp() {
  local algo=$1 env=$2 seed=$3 est=$4 tmo=$5; shift 5
  guard "$algo/$env s$seed" "$est" || return 0
  timeout "$tmo" python -m benchmarking.run_parity "$algo" "$env" --seed "$seed" "$@" \
    > "$LOG_DIR/${algo}_${env}_s${seed}.log" 2>&1
  fin "$algo/$env s$seed" $?
}

runp gail seals_walker2d 4 1200 4200

guard "rlhf hc s2" 1200 && {
  timeout 4800 python -m benchmarking.run_rlhf --env seals_half_cheetah \
    --timesteps 2000000 --comparisons 2000 --iterations 40 --seed 2 \
    > "$LOG_DIR/rlhf_hc_s2.log" 2>&1
  fin "rlhf hc s2" $?
}
guard "rlhf true-ppo hc s1" 900 && {
  timeout 3600 python -m benchmarking.run_rlhf --env seals_half_cheetah \
    --true-baseline --timesteps 2000000 --seed 1 \
    > "$LOG_DIR/rlhf_true_hc_s1.log" 2>&1
  fin "rlhf true-ppo hc s1" $?
}

# stretch: thicken the thinnest adversarial IQM cells
runp gail seals_swimmer 5 1300 2700
runp airl seals_hopper 3 1300 2700
runp gail seals_hopper 3 1300 2700
runp airl seals_walker2d 3 2000 3600
runp airl seals_swimmer 3 1300 2700
echo "[q7] $(date +%H:%M:%S) chip queue complete" | tee -a "$LOG_DIR/queue.log"

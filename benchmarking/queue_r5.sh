#!/bin/bash
# Round-5 heavy (host-MuJoCo) queue, serialized. Priorities (VERDICT r3):
#  1. HalfCheetah expert retrain (weak #2) -> v2 dir; BC/DAgger re-runs on it.
#  2. Every adversarial cell to >=3 seeds (fills first, Ant last-but-one).
#  3. gail swimmer/walker2d extra seeds at the FULL 1e7 reference budget.
# Each adversarial run records a SIGTERM partial if its timeout lands first.
set -u
cd /root/repo
START=$(date +%s)
HARD_END=${QUEUE_HARD_END:-$(( START + 24000 ))}
LOG_DIR=output/r5
mkdir -p "$LOG_DIR"

guard() { # name est_seconds
  local now; now=$(date +%s)
  if (( now + $2 > HARD_END )); then
    echo "[q5] $(date +%H:%M:%S) skip $1 (est $2 s would overrun)" | tee -a "$LOG_DIR/queue.log"
    return 1
  fi
  echo "[q5] $(date +%H:%M:%S) start $1" | tee -a "$LOG_DIR/queue.log"
  return 0
}
fin() { echo "[q5] $(date +%H:%M:%S) done  $1 rc=$2" | tee -a "$LOG_DIR/queue.log"; }

runp() { # algo env seed est tmo extra-args...
  local algo=$1 env=$2 seed=$3 est=$4 tmo=$5; shift 5
  guard "$algo/$env s$seed" "$est" || return 0
  timeout "$tmo" python -m benchmarking.run_parity "$algo" "$env" --seed "$seed" "$@" \
    > "$LOG_DIR/${algo}_${env}_s${seed}.log" 2>&1
  fin "$algo/$env s$seed" $?
}

# 1. HalfCheetah expert v2: resume the 1688-return expert, +4e6 steps.
if guard expert_hc_v2 1800; then
  timeout 3000 python -m benchmarking.train_experts seals_half_cheetah \
    --resume --extra-timesteps 4000000 --out-root output/experts_v2 \
    > "$LOG_DIR/expert_hc_v2.log" 2>&1
  fin expert_hc_v2 $?
fi

# 2. Adversarial fills to n=3 (6e6 budget, matching existing cell seeds).
runp gail seals_hopper 2 900 1800 --total-timesteps 6000000
runp airl seals_hopper 2 1000 2100 --total-timesteps 6000000
runp airl seals_swimmer 2 800 1500 --total-timesteps 6000000
runp gail seals_half_cheetah 2 800 1500 --total-timesteps 6000000
runp airl seals_half_cheetah 2 800 1500 --total-timesteps 6000000

# 3. BC + DAgger HalfCheetah against the v2 expert (replaces the capped
#    column; summarize dedupes by latest_per_seed).
if [ -d output/experts_v2/seals_half_cheetah ]; then
  export PARITY_EXPERTS_DIR=output/experts_v2
  for s in 0 1 2 3 4 5 6 7 8 9; do
    runp bc seals_half_cheetah "$s" 120 600
  done
  runp dagger seals_half_cheetah 0 600 1500
  runp dagger seals_half_cheetah 1 600 1500
  runp dagger seals_half_cheetah 2 600 1500
  unset PARITY_EXPERTS_DIR
fi

# 4. Ant to n>=2 (the most expensive cells; partials recorded on timeout).
runp gail seals_ant 1 4200 4200 --total-timesteps 6000000
runp airl seals_ant 1 4200 4200 --total-timesteps 6000000

# 5. Headline cells at the FULL reference budget (1e7).
runp gail seals_swimmer 2 1100 2400
runp gail seals_swimmer 3 1100 2400
runp gail seals_swimmer 4 1100 2400
runp gail seals_walker2d 2 1400 2700
runp gail seals_walker2d 3 1400 2700

# 6. Ant to n=3.
runp gail seals_ant 2 4200 4200 --total-timesteps 6000000
runp airl seals_ant 2 4200 4200 --total-timesteps 6000000

# 7. Stretch.
runp gail seals_walker2d 4 1400 2700
if [ -d output/experts_v2/seals_half_cheetah ]; then
  export PARITY_EXPERTS_DIR=output/experts_v2
  runp dagger seals_half_cheetah 3 600 1500
  runp dagger seals_half_cheetah 4 600 1500
  unset PARITY_EXPERTS_DIR
fi
runp gail seals_swimmer 0 1100 2400
runp gail seals_swimmer 1 1100 2400

echo "[q5] $(date +%H:%M:%S) queue complete" | tee -a "$LOG_DIR/queue.log"

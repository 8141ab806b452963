#!/bin/bash
# Round-4 chip queue, STRICTLY serialized TPU use.
# Priorities (VERDICT round-2): 1) the two missing adversarial Ant cells,
# 2) a measured RLHF run, 3) >=3 seeds on the headline adversarial cells
# (walker2d + swimmer), then hopper/half_cheetah seeds as time allows.
# A bench.py warm run is reserved at the tail so the driver's end-of-round
# bench doesn't hit cold compiles (compile cache dies between machines).
set -u
cd /root/repo
START=$(date +%s)
HARD_END=${QUEUE_HARD_END:-$(( START + 23400 ))}   # 6.5h of parity items
LOG_DIR=output/r4
mkdir -p "$LOG_DIR"

guard() {
  local now; now=$(date +%s)
  if (( now + $2 > HARD_END )); then
    echo "[queue] $(date +%H:%M:%S) skip $1 (would overrun hard end)" | tee -a "$LOG_DIR/queue.log"
    return 1
  fi
  echo "[queue] $(date +%H:%M:%S) start $1 (timeout $2)" | tee -a "$LOG_DIR/queue.log"
  return 0
}
fin() { echo "[queue] $(date +%H:%M:%S) done  $1 rc=$2" | tee -a "$LOG_DIR/queue.log"; }

runp() {
  local algo=$1 env=$2 seed=$3 tmo=$4; shift 4
  guard "$algo/$env s$seed $*" "$tmo" || return 0
  timeout "$tmo" python -m benchmarking.run_parity "$algo" "$env" --seed "$seed" "$@" \
    > "$LOG_DIR/${algo}_${env}_s${seed}.log" 2>&1
  fin "$algo/$env s$seed" $?
}

# 1. Missing Ant cells (6e6 budget, matching the other adversarial cells
#    run at 60% of the reference's 1e7 budget).
runp gail seals_ant 0 6000 --total-timesteps 6000000
runp airl seals_ant 0 6000 --total-timesteps 6000000

# 2. RLHF measured run (Pendulum device env; chip-bound, tiny host load).
if guard rlhf_pendulum 3600; then
  timeout 3600 python -m benchmarking.run_rlhf > "$LOG_DIR/rlhf_pendulum.log" 2>&1
  fin rlhf_pendulum $?
fi

# 3. Headline adversarial cells to >=3 seeds (walker2d + swimmer first).
runp gail seals_walker2d 1 4200
runp airl seals_walker2d 1 3600 --total-timesteps 6000000
runp gail seals_swimmer  1 3900 --total-timesteps 6000000
runp airl seals_swimmer  1 2700 --total-timesteps 6000000
runp gail seals_walker2d 2 4200
runp airl seals_walker2d 2 3600 --total-timesteps 6000000
runp gail seals_swimmer  2 3900 --total-timesteps 6000000
runp airl seals_swimmer  2 2700 --total-timesteps 6000000

# 4. Stretch: hopper / half_cheetah second seeds.
runp gail seals_hopper 1 3900 --total-timesteps 6000000
runp airl seals_half_cheetah 1 3000 --total-timesteps 6000000
runp airl seals_hopper 1 3900 --total-timesteps 6000000
runp gail seals_half_cheetah 1 3000 --total-timesteps 6000000

# 5. Always warm the bench programs for the driver (ignore hard end).
echo "[queue] $(date +%H:%M:%S) bench warm" | tee -a "$LOG_DIR/queue.log"
timeout 1800 python bench.py > "$LOG_DIR/bench_warm.log" 2>&1
fin bench_warm $?
echo "[queue] $(date +%H:%M:%S) r4 queue complete" | tee -a "$LOG_DIR/queue.log"

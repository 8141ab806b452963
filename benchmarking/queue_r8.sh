#!/bin/bash
# Round-5 chip lane. Waits for the in-flight gail/swimmer s5 job, then
# runs the VERDICT round-5 program: GAIL + AIRL seals/HalfCheetah against
# the SAC-expert (6831.3) demos at the full reference 1e7 budget, the
# missing RLHF HalfCheetah seed, and stretch seeds on the headline cells.
# Every item runs in its own process group recorded in
# output/queue_pids/chip.pgid so bench.py can SIGSTOP the lane during
# measurement (quiet-chip headline, VERDICT r4 weak #1) and SIGCONT after.
# All runners upsert kill-proof partial rows every eval, so a timeout or
# round end never loses a run.
set -u
cd /root/repo
START=$(date +%s)
HARD_END=${QUEUE_HARD_END:-$((START + 21600))}
LOG_DIR=output/r8
PID_DIR=output/queue_pids
mkdir -p "$LOG_DIR" "$PID_DIR"
note() { echo "[q8] $(date +%H:%M:%S) $1" | tee -a "$LOG_DIR/queue.log"; }

# Hand-off: wait for the previous lane occupant (exact PID) to finish.
PREV_PID=${PREV_CHIP_PID:-10444}
while kill -0 "$PREV_PID" 2>/dev/null; do sleep 20; done
note "lane free (prev pid $PREV_PID exited)"

wait_bench() {
  # bench.py drops a sentinel while measuring; don't start a new item
  # under it (running items are paused via SIGSTOP instead).
  while [ -f output/BENCH_RUNNING ]; do sleep 15; done
}

guard() {
  local now; now=$(date +%s)
  if (( now + $2 > HARD_END )); then note "skip $1 (past hard end)"; return 1; fi
  wait_bench
  note "start $1"
}

run_item() {
  # run_item <label> <est_s> <timeout_s> <logfile> <cmd...>
  local label=$1 est=$2 tmo=$3 logf=$4; shift 4
  guard "$label" "$est" || return 0
  setsid timeout "$tmo" "$@" > "$LOG_DIR/$logf" 2>&1 &
  local pid=$!
  echo "$pid" > "$PID_DIR/chip.pgid"
  wait "$pid"; local rc=$?
  rm -f "$PID_DIR/chip.pgid"
  note "done  $label rc=$rc"
}

HC_ENV="PARITY_EXPERTS_DIR=output/experts_v2"

run_item "gail/hc s0 (sac demos, 1e7)" 2400 3900 gail_hc_sac_s0.log \
  env $HC_ENV python -m benchmarking.run_parity gail seals_half_cheetah --seed 0
run_item "airl/hc s0 (sac demos, 1e7)" 2100 3900 airl_hc_sac_s0.log \
  env $HC_ENV python -m benchmarking.run_parity airl seals_half_cheetah --seed 0
run_item "gail/hc s1 (sac demos, 1e7)" 2400 3900 gail_hc_sac_s1.log \
  env $HC_ENV python -m benchmarking.run_parity gail seals_half_cheetah --seed 1
run_item "airl/hc s1 (sac demos, 1e7)" 2100 3900 airl_hc_sac_s1.log \
  env $HC_ENV python -m benchmarking.run_parity airl seals_half_cheetah --seed 1
run_item "airl/hc s2 (sac demos, 1e7)" 2100 3900 airl_hc_sac_s2.log \
  env $HC_ENV python -m benchmarking.run_parity airl seals_half_cheetah --seed 2
run_item "rlhf/hc s2 (2e6, 2000 cmp)" 4200 7800 rlhf_hc_s2.log \
  python -m benchmarking.run_rlhf --env seals_half_cheetah \
    --timesteps 2000000 --comparisons 2000 --iterations 40 --seed 2
# Stretch: thicken headline cells toward the 10-seed protocol.
run_item "gail/swimmer s6" 1300 2700 gail_swimmer_s6.log \
  python -m benchmarking.run_parity gail seals_swimmer --seed 6
run_item "gail/walker2d s5" 2300 3900 gail_walker2d_s5.log \
  python -m benchmarking.run_parity gail seals_walker2d --seed 5
run_item "airl/walker2d s3" 2300 3900 airl_walker2d_s3.log \
  python -m benchmarking.run_parity airl seals_walker2d --seed 3
run_item "gail/swimmer s7" 1300 2700 gail_swimmer_s7.log \
  python -m benchmarking.run_parity gail seals_swimmer --seed 7
run_item "airl/swimmer s3" 1300 2700 airl_swimmer_s3.log \
  python -m benchmarking.run_parity airl seals_swimmer --seed 3

# Always end by warming bench.py's jitted programs so the driver's
# end-of-round bench (a fresh process) hits the on-disk compile cache.
wait_bench
note "queue drained; warming bench"
timeout 2400 python bench.py > "$LOG_DIR/bench_warm.log" 2>&1
note "bench warm rc=$? — chip lane complete"

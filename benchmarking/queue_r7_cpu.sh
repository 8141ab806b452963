#!/bin/bash
# Round-4 CPU lane: dagger/seals_ant seeds 1-2 (the last n=1 cell). A
# full Ant dagger run is ~5h on this 2-core host; the runner now records
# a SIGTERM partial with its learning history, so capped runs still land
# a plateau-level row (seed 0 reached 2.16e3 return by 2.2e5 samples in
# the round-3 attempt that recorded nothing). Then dagger/walker2d s4.
set -u
cd /root/repo
LOG_DIR=output/r6
mkdir -p "$LOG_DIR"
note() { echo "[q7cpu] $(date +%H:%M:%S) $1" | tee -a "$LOG_DIR/queue_cpu.log"; }
runc() {
  local algo=$1 env=$2 seed=$3 tmo=$4
  note "start $algo/$env s$seed (timeout $tmo)"
  timeout "$tmo" python -m benchmarking.run_parity_cpu "$algo" "$env" --seed "$seed" \
    > "$LOG_DIR/cpu_${algo}_${env}_s${seed}.log" 2>&1
  note "done $algo/$env s$seed rc=$?"
}
runc dagger seals_ant 1 7200
runc dagger seals_ant 2 7200
runc dagger seals_walker2d 4 7200
runc dagger seals_ant 3 7200
note "cpu queue complete"

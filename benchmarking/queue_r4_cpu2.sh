#!/bin/bash
# Serialized remainder of the CPU fill: the dagger seeds the first queue
# lost to timeouts/contention, then an RLHF Pendulum with a higher
# comparison budget. Generous timeouts, one item at a time.
set -u
cd /root/repo
LOG_DIR=output/r4
run() {
  local name=$1 tmo=$2; shift 2
  echo "[cpuq2] $(date +%H:%M:%S) start $name" >> "$LOG_DIR/cpu_queue.log"
  timeout "$tmo" "$@" > "$LOG_DIR/cpu2_${name}.log" 2>&1
  echo "[cpuq2] $(date +%H:%M:%S) done  $name rc=$?" >> "$LOG_DIR/cpu_queue.log"
}
run dagger_w2d_s2 7200 python -m benchmarking.run_parity_cpu dagger seals_walker2d --seed 2
run dagger_hopper_s2 5400 python -m benchmarking.run_parity_cpu dagger seals_hopper --seed 2
run dagger_swimmer_s2 5400 python -m benchmarking.run_parity_cpu dagger seals_swimmer --seed 2
run rlhf_pendulum_1500 7200 python -c "
import jax; jax.config.update('jax_platforms','cpu')
import sys; sys.argv=['run_rlhf','--env','pendulum','--comparisons','1500']
from benchmarking.run_rlhf import main; main()
"
run dagger_ant_s1 10800 python -m benchmarking.run_parity_cpu dagger seals_ant --seed 1

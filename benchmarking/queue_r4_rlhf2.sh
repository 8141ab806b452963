#!/bin/bash
# Pendulum RLHF rerun with the reference's fine-tuned tutorial HPs, plus a
# matched-HP true-reward PPO baseline (the self-consistency gate).
set -u
cd /root/repo
LOG_DIR=output/r4
echo "[rlhf2] $(date +%H:%M:%S) start pendulum tuned" >> "$LOG_DIR/rlhf_queue.log"
timeout 7200 python -c "
import jax; jax.config.update('jax_platforms','cpu')
import sys; sys.argv=['run_rlhf','--env','pendulum']
from benchmarking.run_rlhf import main; main()
" > "$LOG_DIR/rlhf_pendulum_tuned.log" 2>&1
echo "[rlhf2] $(date +%H:%M:%S) done pendulum tuned rc=$?" >> "$LOG_DIR/rlhf_queue.log"
echo "[rlhf2] $(date +%H:%M:%S) start pendulum true tuned" >> "$LOG_DIR/rlhf_queue.log"
timeout 3600 python -c "
import jax; jax.config.update('jax_platforms','cpu')
import sys; sys.argv=['run_rlhf','--env','pendulum','--true-baseline']
from benchmarking.run_rlhf import main; main()
" > "$LOG_DIR/rlhf_pendulum_true_tuned.log" 2>&1
echo "[rlhf2] $(date +%H:%M:%S) done pendulum true tuned rc=$?" >> "$LOG_DIR/rlhf_queue.log"

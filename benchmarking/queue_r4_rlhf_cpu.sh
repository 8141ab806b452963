#!/bin/bash
# RLHF evidence runs on the CPU backend (chip busy with the parity queue):
# 1. seals/HalfCheetah RLHF cell (1M steps / 1000 comparisons)
# 2. Pendulum true-reward PPO baseline (gate for the chip's Pendulum RLHF)
# HalfCheetah's true-PPO-at-same-budget comparison is the measured expert
# (1688.8 at 1e6 steps, same HPs — benchmarking/train_experts.py).
set -u
cd /root/repo
LOG_DIR=output/r4
mkdir -p "$LOG_DIR"
echo "[rlhfq] $(date +%H:%M:%S) start half_cheetah" >> "$LOG_DIR/rlhf_queue.log"
JAX_PLATFORMS=cpu timeout 7200 python -c "
import jax; jax.config.update('jax_platforms','cpu')
import sys; sys.argv=['run_rlhf','--env','seals_half_cheetah']
from benchmarking.run_rlhf import main; main()
" > "$LOG_DIR/rlhf_half_cheetah.log" 2>&1
echo "[rlhfq] $(date +%H:%M:%S) done half_cheetah rc=$?" >> "$LOG_DIR/rlhf_queue.log"
echo "[rlhfq] $(date +%H:%M:%S) start pendulum true baseline" >> "$LOG_DIR/rlhf_queue.log"
timeout 5400 python -c "
import jax; jax.config.update('jax_platforms','cpu')
import sys; sys.argv=['run_rlhf','--env','pendulum','--true-baseline']
from benchmarking.run_rlhf import main; main()
" > "$LOG_DIR/rlhf_pendulum_true.log" 2>&1
echo "[rlhfq] $(date +%H:%M:%S) done pendulum true rc=$?" >> "$LOG_DIR/rlhf_queue.log"

#!/bin/bash
# Parity queue, round-1 continuation session (single TPU chip: one job at
# a time). AIRL Walker2d at the reference tuned HPs is the priority (the
# one in-repo reference number not yet beaten); 6M-step budget so the
# final eval lands inside this session's wall clock (incremental history
# dumps cover the curve either way). DAgger cells + Swimmer expert
# continuation follow; whatever the session cutoff truncates leaves
# checkpoints/history for the next round.
set -u
cd /root/repo
timeout 2550 python -m benchmarking.run_parity airl seals_walker2d --total-timesteps 6000000 || echo "FAILED/CUT: airl walker"
timeout 1100 python -m benchmarking.run_parity dagger seals_walker2d || echo "FAILED/CUT: dagger walker"
timeout 1100 python -m benchmarking.run_parity dagger seals_ant || echo "FAILED/CUT: dagger ant"
timeout 3600 python -m benchmarking.train_experts seals_swimmer --resume --extra-timesteps 4000000 || echo "FAILED/CUT: swimmer expert resume"
timeout 1100 python -m benchmarking.run_parity dagger seals_swimmer || echo "FAILED/CUT: dagger swimmer"
echo QUEUE_DONE

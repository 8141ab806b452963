#!/bin/bash
# Sequential parity queue for the rest of round 1 (single TPU chip: one job
# at a time). Waits for the currently-running GAIL Walker2d run first.
set -u
cd /root/repo
while pgrep -f "run_parity gail seals_walker2d" >/dev/null 2>&1; do sleep 20; done
for job in "dagger seals_half_cheetah" "dagger seals_walker2d" "dagger seals_hopper" "dagger seals_swimmer" "dagger seals_ant"; do
  timeout 2400 python -m benchmarking.run_parity $job || echo "FAILED: $job"
done
timeout 4500 python -m benchmarking.run_parity airl seals_walker2d || echo "FAILED: airl walker"
timeout 5400 python -m benchmarking.run_parity gail seals_swimmer || echo "FAILED: gail swimmer"
echo QUEUE_DONE

#!/bin/bash
# Sequential parity queue, rest of round 1 (single TPU chip: one job at a
# time). Waits for the currently-running GAIL Walker2d run first.
# GAIL Swimmer is deferred to round 2: it needs the retrained expert.
set -u
cd /root/repo
while pgrep -f "run_parity gail seals_walker2d" >/dev/null 2>&1; do sleep 20; done
for job in "dagger seals_half_cheetah" "dagger seals_walker2d" "dagger seals_hopper" "dagger seals_ant"; do
  timeout 2400 python -m benchmarking.run_parity $job || echo "FAILED: $job"
done
timeout 4500 python -m benchmarking.run_parity airl seals_walker2d || echo "FAILED: airl walker"
# Swimmer expert was still climbing at its 1M budget (144 vs reference 295):
# continue training; checkpoints persist for round 2 even if cut off.
timeout 3600 python -m benchmarking.train_experts seals_swimmer --resume --extra-timesteps 4000000 || echo "FAILED: swimmer expert resume"
timeout 2400 python -m benchmarking.run_parity dagger seals_swimmer || echo "FAILED: dagger swimmer"
echo QUEUE_DONE

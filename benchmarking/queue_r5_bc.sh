#!/bin/bash
# BC matrix re-run with the reference-exact normalized policy
# (FeedForward32 + NormalizeFeaturesExtractor, tuned_hps/bc_*.json) for
# every env x 10 seeds. Cheetah runs against the v2 (SAC, 6831) expert —
# the queue_r5.sh block also covers it, but latest_per_seed dedupe makes
# reruns harmless. Waits for light2 to finish to cap CPU contention.
set -u
cd /root/repo
LOG_DIR=output/r5
note() { echo "[q5bc] $(date +%H:%M:%S) $1" | tee -a "$LOG_DIR/queue_bc.log"; }
while ! grep -q "light2 complete" "$LOG_DIR/queue_light.log" 2>/dev/null; do sleep 60; done
for env in seals_hopper seals_swimmer seals_walker2d seals_ant; do
  for s in 0 1 2 3 4 5 6 7 8 9; do
    note "bc $env s$s"
    timeout 900 python -m benchmarking.run_parity bc "$env" --seed "$s" \
      > "$LOG_DIR/bc_${env}_s${s}.log" 2>&1
    note "bc $env s$s rc=$?"
  done
done
note "bc matrix complete"

#!/bin/bash
# Quality A/B (VERDICT r2 #4 / r4 #5): exact reference semantics vs shipped
# approximations, 400 epochs each on the RESULTS synthetic protocol.
# Prints the final Acc/Comp/depth-L1 of both arms for PARITY.md/RESULTS.md.
#
# The live arm's trainer pid is published at /tmp/ab_run.pid so a concurrent
# bench.py (driver round-end protocol) can SIGSTOP it instead of timing
# queue-waits against it; the trainer resumes from its workspace checkpoints,
# so a pause or kill costs at most exp.ckpt_interval epochs.
set -eu
cd "$(dirname "$0")/.."
# arm trainers exit without idling the chip behind their detached 3-D-metric
# eval (CPU-bound, ~1 h on this host); the caller re-waits for the rows
# (round5_after_run.sh final stage) before reading them
export MORPHEUS_EVAL_DRAIN_S=${MORPHEUS_EVAL_DRAIN_S:-0}
for arm in ab_exact ab_shipped; do
  if [ "${MORPHEUS_AB_RESUME:-0}" != "1" ]; then
    rm -rf "exp/$arm"
  fi
  echo "=== $arm: $(date -u +%FT%TZ)"
  T0=$(date +%s)
  python morpheus.py --config "configs/$arm.yaml" &
  echo $! > /tmp/ab_run.pid
  wait $! || { rm -f /tmp/ab_run.pid; echo "$arm FAILED"; exit 1; }
  rm -f /tmp/ab_run.pid
  echo "=== $arm done in $(( $(date +%s) - T0 ))s"
done
echo "--- metric_3d ---"
for arm in ab_exact ab_shipped; do
  echo "[$arm]"; cat "exp/$arm/metric_3d.txt" 2>/dev/null || echo missing
  echo -n "depth-L1 mean: "
  cat "exp/$arm/depths/depth_error/depthL1_score_mean.txt" 2>/dev/null \
    || find "exp/$arm" -name 'depthL1_score_mean.txt' -exec cat {} \;
done

#!/bin/bash
# Quality A/B (VERDICT r2 #4): exact reference semantics vs shipped
# approximations, 200 epochs each on the RESULTS synthetic protocol.
# Prints the final Acc/Comp/depth-L1 of both arms for PARITY.md.
set -eu
cd "$(dirname "$0")/.."
for arm in ab_exact ab_shipped; do
  rm -rf "exp/$arm"
  echo "=== $arm: $(date -u +%FT%TZ)"
  T0=$(date +%s)
  python morpheus.py --config "configs/$arm.yaml"
  echo "=== $arm done in $(( $(date +%s) - T0 ))s"
done
echo "--- metric_3d ---"
for arm in ab_exact ab_shipped; do
  echo "[$arm]"; cat "exp/$arm/metric_3d.txt" 2>/dev/null || echo missing
  echo -n "depth-L1 mean: "
  cat "exp/$arm/depths/depth_error/depthL1_score_mean.txt" 2>/dev/null \
    || find "exp/$arm" -name 'depthL1_score_mean.txt' -exec cat {} \;
done

#!/bin/bash
# Round-4 post-run chip pipeline: waits for the full-budget supervisor
# (/tmp/fullrun.pid) to finish, then — only on a COMPLETE run — executes the
# measurement suite and the quality A/B in sequence. Everything lands in
# /tmp/tpu_results_r4 for the PARITY.md roofline + RESULTS.md writeups.
# Ordering: cheap/high-value first (wallclock, roofline, ablations, bench)
# so a tunnel outage mid-pipeline loses the least.
set -u
OUT=/tmp/tpu_results_r4
mkdir -p $OUT
cd "$(dirname "$0")/.."
WS=exp/synthetic_full

echo "$(date -u +%FT%TZ) waiting for full-budget run" | tee $OUT/status
while kill -0 "$(cat /tmp/fullrun.pid 2>/dev/null)" 2>/dev/null; do
  sleep 120
done
if ! grep -q "run COMPLETE" "$WS/supervisor.log"; then
  echo "$(date -u +%FT%TZ) supervisor exited WITHOUT completion — stopping" \
    | tee -a $OUT/status
  exit 1
fi
echo "$(date -u +%FT%TZ) run complete; starting measurements" | tee -a $OUT/status

python scripts/wallclock_report.py $WS > $OUT/wallclock.txt 2>&1
cp "$WS/metric_3d.txt" $OUT/ 2>/dev/null
find "$WS" -name 'depthL1_score_mean.txt' -exec cp {} $OUT/ \; 2>/dev/null

echo "== roofline splits (achieved GB/s, base + late) ==" | tee -a $OUT/status
timeout 2400 python scripts/profile_step.py --roofline 300 \
    > $OUT/roofline_300.txt 2>&1
echo "roofline_300 rc=$?" | tee -a $OUT/status
timeout 2400 python scripts/profile_step.py --roofline 1900 \
    > $OUT/roofline_1900.txt 2>&1
echo "roofline_1900 rc=$?" | tee -a $OUT/status

echo "== step ablations (incl. late bf16-MLP, VERDICT r3 #5) ==" \
    | tee -a $OUT/status
timeout 3600 python scripts/profile_step.py \
    base occ_off no_band no_perturb no_smooth render_only bf16_mlp \
    late late_bf16_mlp no_merge no_code no_orient \
    > $OUT/profile.txt 2>&1
echo "profile rc=$?" | tee -a $OUT/status

echo "== bench.py (driver protocol, all SDS variants incl. s05) ==" \
    | tee -a $OUT/status
BENCH_SDS=all BENCH_BUDGET_S=3600 timeout 4200 python bench.py \
    > $OUT/bench.json 2> $OUT/bench.err
echo "bench rc=$?" | tee -a $OUT/status

echo "== quality A/B (exact vs shipped semantics, 400 epochs each) ==" \
    | tee -a $OUT/status
timeout 18000 bash scripts/run_ab.sh > $OUT/ab.txt 2>&1
echo "ab rc=$?" | tee -a $OUT/status
echo "$(date -u +%FT%TZ) ALL DONE" | tee -a $OUT/status
